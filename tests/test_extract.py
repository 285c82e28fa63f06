"""Stage 2/3: frozen extractor byte-identity + segmentation inverse."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from kgraft.extract.html import extract_blocks, extract_text, text_to_segments
from kgraft.extract.segment import html_to_text_batch, segment_batch


def test_byte_identity_vs_golden(corpus):
    pages = pq.read_table(os.path.join(corpus, "pages.parquet"))
    golden = pq.read_table(os.path.join(corpus, "golden_text.parquet"))
    gold = dict(zip(golden["url"].to_pylist(), golden["text"].to_pylist()))
    for url, html in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        assert extract_text(html) == gold[url], f"text drift for {url}"


def test_boilerplate_dropped():
    html = (
        "<html><head><script>x()</script><style>a{}</style></head><body>"
        "<nav>Home About</nav><header>Logo</header>"
        "<table><tr><td>Decoy was founded by Noise</td></tr></table>"
        "<article><p>Real <b>content</b> here.</p></article>"
        "<aside>Ad</aside><form><input/></form><footer>c</footer></body></html>"
    )
    assert extract_blocks(html) == ["Real content here."]


def test_whitespace_normalization():
    html = "<p>  a\n  b\t c  </p><p>d</p>"
    assert extract_text(html) == "a b c\nd"


def test_segmentation_is_exact_inverse(corpus):
    golden = pq.read_table(os.path.join(corpus, "golden_text.parquet"))
    for text in golden["text"].to_pylist()[:50]:
        assert "\n".join(text_to_segments(text)) == text


def test_batch_transforms(corpus, ray_session):
    pages = pq.read_table(os.path.join(corpus, "pages.parquet")).slice(0, 10)
    out = html_to_text_batch(pages)
    assert "html" not in out.column_names
    assert out["text"].to_pylist() == pages["text"].to_pylist()
    segs = segment_batch(out)
    assert segs.column_names == ["url", "warc_ts", "seg_idx", "seg_text", "lang"]
    # rebuild page 0's text from its segments
    url0 = pages["url"][0].as_py()
    mine = [
        (i, s)
        for u, i, s in zip(
            segs["url"].to_pylist(),
            segs["seg_idx"].to_pylist(),
            segs["seg_text"].to_pylist(),
        )
        if u == url0
    ]
    rebuilt = "\n".join(s for _, s in sorted(mine))
    assert rebuilt == pages["text"][0].as_py()


def test_extractor_survives_garbage():
    """Malformed / binary / truncated html must never raise — CC corpora
    are full of it; a crash would fail the whole block."""
    cases = [
        b"\x00\xff\xfe garbage \x80\x81",
        "<p>unclosed <b>nested <i>tags",
        "<table><tr><td>only boilerplate</td></tr></table>",
        "",
        "<html><body>" + "<div>" * 500 + "deep" + "</div>" * 10,
        "plain text with no tags at all",
        b"\xf0\x9f\x98\x80 emoji bytes <p>ok</p>".decode("utf-8"),
    ]
    for html in cases:
        text = extract_text(html)
        assert isinstance(text, str)
    assert extract_text("<table><tr><td>x</td></tr></table>") == ""
    assert "deep" in extract_text(cases[4])


def test_page_meta_and_tables_golden(ray_session):
    """Meta/tables extraction vs the synth generator's known chrome: every
    page has title 'Bulletin {i} from site {site}', an identical h1, and
    exactly one decoy table with the known cells (synth.py _CHROME_TAIL).
    The frozen text extractor must still DROP the table (byte identity)."""
    import os

    import ray

    from kgraft.extract.meta import parse_meta_tables
    from kgraft.queries import page_meta, page_tables
    from kgraft.synth import corpus_dir

    meta = page_meta("/root/testdata/sf0.001").to_pandas()
    tabs = page_tables("/root/testdata/sf0.001").to_pandas()
    assert len(meta) == 200 and len(tabs) == 200
    assert meta["title"].str.match(r"Bulletin \d+ from site \d+").all()
    assert (meta["title"] == meta["h1"]).all()
    assert (tabs["n_tables"] == 1).all()
    assert (
        tabs["tables"].map(lambda ts: ts[0])
        == "DecoyEntity Alpha was founded by DecoyEntity Beta"
    ).all()
    # table content must NOT leak into the canonical extracted text
    d = corpus_dir(200)
    import pyarrow.parquet as pq

    texts = pq.read_table(os.path.join(d, "pages.parquet"), columns=["text"])
    assert not any("DecoyEntity" in t for t in texts["text"].to_pylist())


def test_parse_meta_tables_handles_nesting_and_attrs():
    from kgraft.extract.meta import parse_meta_tables

    html = (
        "<html><head><title> A  Title </title>"
        '<meta name="Description" content="  some   desc "/></head>'
        '<body><h1 class="x">Head<span>ing</span></h1>'
        '<table border="1"><tr><td>a</td><th>b</th></tr><tr><td>c</td></tr></table>'
        "<table><tr><td>second</td></tr></table></body></html>"
    )
    m = parse_meta_tables(html)
    assert m["title"] == "A Title"
    assert m["h1"] == "Head ing"
    assert m["meta_description"] == "some desc"
    assert m["tables"] == ["a b\nc", "second"]

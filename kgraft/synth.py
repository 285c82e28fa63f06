"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Draws a closed world first (entities with Zipf-skewed mention frequency,
aliases, facts over ~12 predicates), then renders web pages from it:
boilerplate chrome (nav/header/footer/script/decoy table — all dropped by
the frozen extractor) around an ``<article>`` of sections whose sentences
encode the planted facts. Because pages are rendered *from* facts, the
golden triples / components / alias dict are exact by construction.

Everything is seeded ``np.random.RandomState`` — no wall clock, no
randomized ``hash()`` — so the same ``(seed, n_pages)`` always produces
byte-identical parquet. The ``text`` column is produced by the frozen
extractor (:mod:`kgraft.extract.html`), making it the byte-identity oracle
column the pipeline must reproduce (``BASELINE.json`` ``input_hint``).

Reference seed for the *shape* of documents: meta + body sections + decoy
tables (reference ``tools/entrez.py:184-189``, ``:36-56``, ``:71-85``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extract.html import extract_blocks, extract_text

SYNTH_VERSION = 4  # v4: pages written in small row groups so Ray's parquet
# read produces enough blocks to parallelize (one giant row group = one
# block = a serial pipeline)
EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

PREDICATES = [
    ("founded_by", "was founded by"),
    ("located_in", "is located in"),
    ("works_for", "works for"),
    ("acquired", "has acquired"),
    ("partnered_with", "partnered with"),
    ("ceo_of", "is the chief executive of"),
    ("produces", "produces"),
    ("competes_with", "competes with"),
    ("subsidiary_of", "is a subsidiary of"),
    ("invested_in", "invested in"),
    ("collaborates_with", "collaborates with"),
    ("supplies", "supplies"),
]

_SYL = [
    "zor", "vex", "bri", "mond", "tal", "qui", "nar", "fen", "lux", "ard",
    "gly", "pex", "run", "sol", "thi", "umb", "vael", "wyn", "xan", "yor",
    "kel", "dra", "mir", "ost", "pel", "qar", "riv", "sta", "tur", "ulm",
    "ver", "wex", "yil", "zen", "ban", "cor", "del", "eph", "fir", "gor",
]

_SUFFIX = ["Corp", "Labs", "Group", "Systems", "Institute", "Holdings", "Partners", "Networks"]
_EXPAND = {
    "Corp": "Corporation",
    "Labs": "Laboratories",
    "Group": "Grouping",
    "Systems": "Systemworks",
    "Institute": "Institution",
    "Holdings": "Holding Company",
    "Partners": "Partnership",
    "Networks": "Networking",
}

_FILLER = [
    "The quarterly report showed steady growth across all divisions.",
    "Analysts remain cautious about the outlook for next year.",
    "Several independent reviews praised the overall methodology.",
    "Regional demand continued to fluctuate throughout the period.",
    "The committee published its findings after a lengthy review.",
    "Market conditions shifted considerably during the spring.",
    "Observers noted a marked improvement in operational efficiency.",
    "The annual survey collected responses from thousands of participants.",
]


def norm_surface(s: str) -> str:
    """Linking normalization: lowercase + whitespace collapse (NFC-safe ascii)."""
    return " ".join(s.lower().split())


def _word(i: int) -> str:
    """Unique pronounceable word for entity ``i`` (mixed-radix syllables)."""
    digits = []
    n = i
    while True:
        digits.append(n % len(_SYL))
        n //= len(_SYL)
        if n == 0:
            break
    return "".join(_SYL[d] for d in reversed(digits)).capitalize()


@dataclass
class World:
    """The closed world a corpus is rendered from."""

    entity_ids: np.ndarray
    canonicals: list
    alias_lists: list  # list[list[str]] — all aliases incl. canonical
    heldout: set  # normalized aliases absent from the public alias dict
    facts: list  # list[(subj_id, pred_key, obj_id)]
    rng: np.random.RandomState = field(repr=False, default=None)


def build_world(n_pages: int, seed: int = 42) -> World:
    rng = np.random.RandomState(seed)
    n_entities = max(24, n_pages // 10)
    ids = np.arange(n_entities, dtype=np.int64)

    canonicals, alias_lists = [], []
    seen = set()
    for i in range(n_entities):
        w = _word(i)
        suf = _SUFFIX[int(rng.randint(len(_SUFFIX)))]
        canonical = f"{w} {suf}"
        aliases = [canonical, w, f"{w} {_EXPAND[suf]}", f"{w}-{suf}"]
        abbrev = (w[:3] + suf[0]).upper()
        if abbrev not in seen:
            aliases.append(abbrev)
        for a in aliases:
            seen.add(a)
        canonicals.append(canonical)
        alias_lists.append(aliases)

    # Hold ~10% of the *variant* aliases (expansion/hyphen forms — near-dups
    # of the canonical, recoverable via MinHash-LSH) out of the alias dict.
    heldout = set()
    for i in range(n_entities):
        if rng.rand() < 0.20:
            victim = alias_lists[i][2 + int(rng.randint(2))]  # expansion or hyphen
            heldout.add(norm_surface(victim))

    # Zipf-skewed entity participation → head-entity skew fixture.
    zipf_w = 1.0 / np.arange(1, n_entities + 1, dtype=np.float64)
    zipf_w /= zipf_w.sum()
    n_facts = max(48, n_pages * 2)
    subs = rng.choice(n_entities, size=n_facts * 2, p=zipf_w)
    objs = rng.choice(n_entities, size=n_facts * 2, p=zipf_w)
    preds = rng.randint(len(PREDICATES), size=n_facts * 2)
    facts, fact_seen = [], set()
    for s, p, o in zip(subs, preds, objs):
        if s == o:
            continue
        key = (int(s), int(p), int(o))
        if key in fact_seen:
            continue
        fact_seen.add(key)
        facts.append((int(s), PREDICATES[int(p)][0], int(o)))
        if len(facts) >= n_facts:
            break
    return World(ids, canonicals, alias_lists, heldout, facts, rng)


_CHROME_HEAD = (
    "<!DOCTYPE html><html><head><title>{title}</title>"
    "<script>window.__t=Date.now();function track(x){{return x*2}}</script>"
    "<style>.main{{color:#222;margin:0 auto}}</style></head><body>"
    "<header><div class=\"logo\">Site {site} News Portal</div></header>"
    "<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About</a></li>"
    "<li><a href=\"/archive\">Archive</a></li></ul></nav>"
)
_CHROME_TAIL = (
    "<aside>Sponsored: limited time offer on premium subscriptions.</aside>"
    "<table><tr><td>DecoyEntity Alpha</td><td>was founded by</td>"
    "<td>DecoyEntity Beta</td></tr></table>"
    "<form><input name=\"q\"/></form>"
    "<footer>Copyright 2025 Site {site}. All rights reserved.</footer></body></html>"
)


def _render_page(world: World, rng, page_idx: int, site: int):
    """Render one page. Returns (html:str, blocks:list[str], triples:list)."""
    n_ent = len(world.canonicals)
    title = f"Bulletin {page_idx} from site {site}"
    parts = [_CHROME_HEAD.format(title=title, site=site)]
    blocks, triples = [], []
    parts.append("<article><h1>%s</h1>" % title)
    blocks.append(title)
    n_secs = 2 + int(rng.randint(3))
    for s in range(n_secs):
        heading = f"Section {s + 1}"
        parts.append(f"<section><h2>{heading}</h2>")
        blocks.append(heading)
        for _ in range(1 + int(rng.randint(3))):
            sentences = []
            seg_idx = len(blocks)
            for _ in range(1 + int(rng.randint(3))):
                if rng.rand() < 0.55 and world.facts:
                    f_i = int(rng.randint(len(world.facts)))
                    s_id, pred, o_id = world.facts[f_i]
                    s_surf = world.alias_lists[s_id][int(rng.randint(len(world.alias_lists[s_id])))]
                    o_surf = world.alias_lists[o_id][int(rng.randint(len(world.alias_lists[o_id])))]
                    phrase = dict(PREDICATES)[pred]
                    sentences.append(f"{s_surf} {phrase} {o_surf}.")
                    triples.append((seg_idx, s_surf, pred, o_surf, s_id, o_id))
                else:
                    sentences.append(_FILLER[int(rng.randint(len(_FILLER)))])
            para = " ".join(sentences)
            # inline markup inside the paragraph exercises stripped_strings-join
            if rng.rand() < 0.3 and " " in para:
                first, rest = para.split(" ", 1)
                para_html = f"<b>{first}</b> {rest}"
            else:
                para_html = para
            parts.append(f"<p>{para_html}</p>")
            blocks.append(para)
        parts.append("</section>")
    parts.append("</article>")
    parts.append(_CHROME_TAIL.format(site=site))
    return "".join(parts), blocks, triples


def generate_corpus(out_dir: str, n_pages: int = 200, seed: int = 42) -> dict:
    """Generate the corpus + goldens into ``out_dir``. Returns file paths.

    Files written: ``pages.parquet`` (PAGES schema), ``golden_triples``,
    ``golden_text``, ``golden_components``, ``alias_dict``, ``entities``.
    """
    os.makedirs(out_dir, exist_ok=True)
    world = build_world(n_pages, seed)
    rng = np.random.RandomState(seed + 1)
    n_sites = max(4, n_pages // 25)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    g_url, g_seg, g_subj, g_pred, g_obj, g_sid, g_oid = [], [], [], [], [], [], []
    langs_pool = ["en"] * 9 + ["de", "fr"]

    originals = []  # (html, blocks, triples) for dup/near-dup sampling
    for i in range(n_pages):
        site = i % n_sites
        url = f"https://site{site}.example/page/{i}"
        r = rng.rand()
        if i > 20 and r < 0.05 and originals:
            # exact duplicate under a distinct url
            html, blocks, triples = originals[int(rng.randint(len(originals)))]
        elif i > 20 and r < 0.10 and originals:
            # near duplicate: re-render with one filler sentence appended
            src_html, src_blocks, src_triples = originals[int(rng.randint(len(originals)))]
            extra = _FILLER[int(rng.randint(len(_FILLER)))]
            html = src_html.replace(
                "</article>", f"<p>{extra}</p></article>", 1
            )
            blocks = src_blocks + [extra]
            triples = src_triples
        else:
            html, blocks, triples = _render_page(world, rng, i, site)
            originals.append((html, blocks, triples))
        text = "\n".join(blocks)
        # generator self-check: frozen extractor must reproduce the blocks
        assert extract_text(html) == text, f"extractor drift on page {i}"
        urls.append(url)
        tss.append(EPOCH_US + i * 60_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(langs_pool[int(rng.randint(len(langs_pool)))])
        for seg_idx, s_surf, pred, o_surf, s_id, o_id in triples:
            g_url.append(url)
            g_seg.append(seg_idx)
            g_subj.append(s_surf)
            g_pred.append(pred)
            g_obj.append(o_surf)
            g_sid.append(s_id)
            g_oid.append(o_id)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    pq.write_table(pages, os.path.join(out_dir, "pages.parquet"), row_group_size=256)

    golden_triples = pa.table(
        {
            "url": pa.array(g_url, pa.string()),
            "seg_idx": pa.array(g_seg, pa.int32()),
            "subj": pa.array(g_subj, pa.string()),
            "pred": pa.array(g_pred, pa.string()),
            "obj": pa.array(g_obj, pa.string()),
            "subj_id": pa.array(g_sid, pa.int64()),
            "obj_id": pa.array(g_oid, pa.int64()),
        }
    )
    pq.write_table(golden_triples, os.path.join(out_dir, "golden_triples.parquet"))

    pq.write_table(
        pa.table({"url": pages["url"], "text": pages["text"]}),
        os.path.join(out_dir, "golden_text.parquet"),
    )

    # alias dict (normalized alias -> entity_id), with held-out variants
    a_alias, a_id = [], []
    for i, aliases in enumerate(world.alias_lists):
        for a in aliases:
            na = norm_surface(a)
            if na not in world.heldout:
                a_alias.append(na)
                a_id.append(i)
    pq.write_table(
        pa.table({"alias": pa.array(a_alias, pa.string()), "entity_id": pa.array(a_id, pa.int64())}),
        os.path.join(out_dir, "alias_dict.parquet"),
    )

    # entities table
    pq.write_table(
        pa.table(
            {
                "entity_id": pa.array(world.entity_ids, pa.int64()),
                "canonical": pa.array(world.canonicals, pa.string()),
                "aliases": pa.array(world.alias_lists, pa.list_(pa.string())),
            }
        ),
        os.path.join(out_dir, "entities.parquet"),
    )

    # golden connected components over the *rendered* fact graph (union-find)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rendered_nodes = sorted(set(g_sid) | set(g_oid))
    for s, o in zip(g_sid, g_oid):
        union(s, o)
    comp = pa.table(
        {
            "entity_id": pa.array(rendered_nodes, pa.int64()),
            "component_id": pa.array([find(n) for n in rendered_nodes], pa.int64()),
        }
    )
    pq.write_table(comp, os.path.join(out_dir, "golden_components.parquet"))

    return {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "golden_triples": os.path.join(out_dir, "golden_triples.parquet"),
        "golden_text": os.path.join(out_dir, "golden_text.parquet"),
        "golden_components": os.path.join(out_dir, "golden_components.parquet"),
        "alias_dict": os.path.join(out_dir, "alias_dict.parquet"),
        "entities": os.path.join(out_dir, "entities.parquet"),
        "n_pages": n_pages,
    }


def corpus_dir(n_pages: int, seed: int = 42, root: str = "/tmp/kgraft_corpus") -> str:
    """Cached corpus path for ``(version, n_pages, seed)``; generates on miss."""
    d = os.path.join(root, f"v{SYNTH_VERSION}_n{n_pages}_s{seed}")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        generate_corpus(d, n_pages=n_pages, seed=seed)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def sharded_pages(d: str, n_shards: int = 64) -> str:
    """Content-identical multi-file copy of ``pages.parquet``.

    A single 200 MB+ parquet file scans as ONE Ray read task (files, not
    row groups, bound read parallelism), which serializes the front of
    the flagship job — measured 13.9 s of single-threaded read at 400 k
    pages before the 32-CPU map pool could saturate. Splitting into one
    file per read task removes that serial prefix. Built lazily next to
    the cached corpus (idempotent, own marker) so existing caches keep
    their goldens byte-identical. At real scale the corpus arrives
    sharded (one file per WARC chunk); this mirrors that layout.
    """
    out = os.path.join(d, f"pages_sharded_{n_shards}")
    # marker lives OUTSIDE the directory: read_parquet scans every file in it
    marker = out + ".done"
    if not os.path.exists(marker):
        t = pq.read_table(os.path.join(d, "pages.parquet"))
        os.makedirs(out, exist_ok=True)
        bounds = np.linspace(0, t.num_rows, n_shards + 1).astype(int)
        for i in range(n_shards):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if hi > lo:
                pq.write_table(
                    t.slice(lo, hi - lo),
                    os.path.join(out, f"part-{i:05d}.parquet"),
                    row_group_size=256,
                )
        with open(marker, "w") as f:
            f.write("ok")
    return out

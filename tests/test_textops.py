"""documents-table operators vs straight-line pandas/duckdb oracles."""

import numpy as np
import pandas as pd

from kgraft import textops

from tests.conftest import SF_DIR


def _docs(ray):
    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])


def _docs_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()


def test_exact_dedup_matches_pandas(ray_session):
    import ray

    got = textops.exact_dedup(_docs(ray)).to_pandas()["doc_id"].sort_values()
    want = _docs_df().groupby("text")["doc_id"].min().sort_values()
    assert got.tolist() == sorted(want.tolist())


def test_token_counts_match_regex(ray_session):
    import re

    import ray

    got = textops.token_counts(_docs(ray)).to_pandas().set_index("doc_id")["n_tokens"]
    df = _docs_df().head(100)
    pat = re.compile(r"[A-Za-z0-9_]+")
    for _, row in df.iterrows():
        assert got[row["doc_id"]] == len(pat.findall(row["text"]))


def test_near_dup_groups_planted(ray_session):
    """Plant exact+near duplicates among distinct docs; MinHash-LSH + verify
    must cluster them (and nothing else)."""
    import ray

    base = (
        "the gondar engine streams arrow batches through actor pools with "
        "backpressure and spills to the object store when memory is tight "
    )
    others = [
        "volcanic eruptions reshape coastlines and bury ancient settlements under ash layers",
        "prune the roses in late winter; mulch beds before the first hard frost arrives",
        "the sicilian defence trades central space for dynamic counterplay on the queenside",
        "trim the mainsail and bear away; the spinnaker fills on a broad reach downwind",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(7),
            "text": [base * 4, base * 4 + " tail.", base * 4, *others],
        }
    )
    out = textops.near_dup_groups(ray.data.from_pandas(docs), threshold=0.7).to_pandas()
    groups = dict(zip(out["doc_id"], out["dup_group"]))
    assert groups[0] == groups[1] == groups[2] == 0
    assert len({groups[i] for i in range(3, 7)}) == 4


def test_ngram_jaccard_groups_matches_bruteforce(ray_session):
    """Pure n-gram-Jaccard dedup must reproduce the brute-force all-pairs
    exact-Jaccard clustering on a planted corpus (LSH is only blocking —
    near-identical docs always share a band)."""
    import itertools

    import ray

    from kgraft.hashing import shingle_hashes

    base = (
        "ray data streams arrow blocks through the object store with "
        "backpressure so wide shuffles never hold the whole corpus in memory "
    )
    texts = [base * 4, base * 4 + " trailing sentence.", base * 4] + [
        f"unrelated filler document number {i} about {w} and nothing else"
        for i, w in enumerate(["kelp", "granite", "meteors", "violins"])
    ]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    out = textops.ngram_jaccard_groups(
        ray.data.from_pandas(docs), threshold=0.7, shingle_k=4
    ).to_pandas()
    groups = dict(zip(out["doc_id"], out["dup_group"]))

    # brute-force oracle: union-find over all pairs with exact Jaccard >= 0.7
    sh = [shingle_hashes(t, 4) for t in texts]
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = np.intersect1d(sh[a], sh[b], assume_unique=True).size
        union = sh[a].size + sh[b].size - inter
        if (inter / union if union else 1.0) >= 0.7:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(len(texts))}
    # same partition: group labels must induce identical equivalence classes
    for a, b in itertools.combinations(range(len(texts)), 2):
        assert (groups[a] == groups[b]) == (expected[a] == expected[b])


def test_simhash_and_fingerprint_deterministic(ray_session):
    import ray

    a = textops.simhash_docs(_docs(ray)).to_pandas().sort_values("doc_id")
    b = textops.simhash_docs(_docs(ray)).to_pandas().sort_values("doc_id")
    assert a["simhash"].tolist() == b["simhash"].tolist()
    f = textops.fingerprint_docs(_docs(ray)).to_pandas()
    assert f["fingerprint"].nunique() > 1


def test_langid_on_real_sentences(ray_session):
    """The sf documents' text is synthetic token soup (lang label carries no
    signal), so the heuristic is validated on genuine sentences instead."""
    import ray

    samples = {
        "en": "the cat sat on the mat and it is happy with the sun for now",
        "de": "der hund ist nicht mit der katze und das ist ein problem auf dem hof",
        "fr": "le chat est dans la maison et les oiseaux sont pour un moment que rien",
        "es": "el perro es de la casa y los gatos que es en un lugar por ahora",
    }
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": range(len(samples)), "text": list(samples.values())}
        )
    )
    pred = textops.langid_docs(ds).to_pandas().sort_values("doc_id")
    assert pred["lang_pred"].tolist() == list(samples.keys())


def test_quality_scores_bounded(ray_session):
    import ray

    q = textops.quality_scores(_docs(ray)).to_pandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1.0)).all()
    assert (q["punct_ratio"] <= 1.0).all()


def test_simhash_near_dup_planted(ray_session):
    import ray

    base = (
        "streaming arrow batches through ray data actor pools with "
        "backpressure object store spilling and per stage resources "
    ) * 3
    docs = pd.DataFrame(
        {
            "doc_id": range(5),
            "text": [
                base,
                base + " tiny tail change.",
                base,
                "a completely different document about marine biology and tides",
                "yet another unrelated text concerning medieval architecture",
            ],
        }
    )
    out = textops.simhash_near_dup(ray.data.from_pandas(docs), max_hamming=3).to_pandas()
    g = dict(zip(out["doc_id"], out["dup_group"]))
    assert g[0] == g[1] == g[2] == 0
    assert g[3] != 0 and g[4] != 0 and g[3] != g[4]


def test_decontaminate_matches_bruteforce(ray_session):
    import ray

    from kgraft.hashing import shingle_hashes

    k = 32
    docs_df = _docs_df()
    bench_df = docs_df[docs_df["doc_id"] % 29 == 0]
    got = (
        textops.decontaminate(
            _docs(ray),
            ray.data.from_pandas(bench_df.reset_index(drop=True)),
            shingle_k=k,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # brute force: union of benchmark shingle hashes, per-doc intersection
    bench_set = set()
    for t in bench_df["text"]:
        bench_set.update(shingle_hashes(t, k).tolist())
    for _, row in docs_df.iterrows():
        hits = len(bench_set.intersection(shingle_hashes(row["text"], k).tolist()))
        assert got.loc[row["doc_id"], "n_hits"] == hits
        assert bool(got.loc[row["doc_id"], "contaminated"]) == (hits > 0)
    # every benchmark doc overlaps itself
    assert got.loc[bench_df["doc_id"], "contaminated"].all()


def test_redact_pii_matches_duckdb_on_planted_pii(ray_session):
    import duckdb
    import ray

    from kgraft.queries import _REDACT_PII_SQL

    texts = [
        "contact me at alice.smith+spam@example.co.uk for details",
        "server at 192.168.0.1 and 10.0.0.255 rebooted",
        "call 555-123-4567 or +1 415-555-0199 now",
        "mixed: bob@x.io from 8.8.8.8 dial 650.555.1212 end",
        "no pii here at all",
        "edge 1234.5.6.7 not-an-ip-boundary 999-99-9999 ssn-like",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        textops.redact_pii(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(_REDACT_PII_SQL).df().sort_values("doc_id").reset_index(drop=True)
    assert got["text_clean"].tolist() == want["text_clean"].tolist()
    # counts: at least every planted item in rows 0-3 got hit
    assert (got.loc[:3, "n_redacted"] >= 1).all()
    assert got.loc[4, "n_redacted"] == 0


def test_dedup_against_planted_overlap(ray_session):
    import ray

    ref_texts = [f"shared document {i}" for i in range(20)]
    new_texts = [f"fresh document {i}" for i in range(40)]
    corpus = pd.DataFrame(
        {
            "doc_id": range(50),
            "text": ref_texts[:10] + new_texts[:40],  # 10 overlap the reference
        }
    )
    reference = pd.DataFrame({"doc_id": range(1000, 1020), "text": ref_texts})
    got = (
        textops.dedup_against(
            ray.data.from_pandas(corpus), ray.data.from_pandas(reference)
        )
        .to_pandas()["doc_id"]
        .sort_values()
        .tolist()
    )
    assert got == list(range(10, 50))


def test_misra_gries_top_tokens_recovers_head_under_compression(ray_session):
    import ray
    from kgraft.textops import approx_top_tokens, _mg_compress

    # planted head: 5 hot tokens, long uniform tail of unique junk so a
    # tiny m forces real decrements in every batch
    rng = np.random.default_rng(11)
    hot = [f"hot{i}" for i in range(5)]
    docs = []
    for d in range(60):
        toks = []
        for i, h in enumerate(hot):
            toks += [h] * (40 - 5 * i)
        toks += [f"junk{d}_{j}" for j in range(300)]
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

    out = approx_top_tokens(
        ray.data.from_pandas(df), k=5, m=64, candidates=32
    )
    # exact oracle
    exact = (
        df["text"].str.lower().str.findall(r"[a-z0-9_]+").explode().value_counts()
    )
    want = exact.iloc[:5]
    assert list(out["token"]) == list(want.index)
    assert list(out["n"]) == [int(x) for x in want.to_numpy()]
    # sketch error was genuinely nonzero (compression exercised) and the
    # k-th head count clears the retention bound, as the guarantee needs
    assert out.attrs["mg_total_err"] > 0
    assert int(want.iloc[-1]) > 0

    # _mg_compress invariants: lower bounds, at most m survivors
    vc = pd.Series([10, 8, 5, 3, 1], index=list("abcde"))
    kept, d = _mg_compress(vc, 2)
    assert d == 5 and len(kept) <= 2
    assert kept["a"] == 5 and kept["b"] == 3


def test_unigram_nll_matches_bruteforce(ray_session):
    import ray
    from collections import Counter
    from kgraft.textops import unigram_nll

    docs = ["the cat sat", "the the zz qq", "cat cat cat unique", ""]
    df = pd.DataFrame({"doc_id": range(4), "text": docs})
    V = 3  # forces OOV hits
    got = (
        unigram_nll(ray.data.from_pandas(df), vocab_size=V)
        .to_pandas()
        .set_index("doc_id")["avg_nll"]
    )

    toks = [t for d in docs for t in d.lower().split()]
    n = len(toks)
    cnt = Counter(toks)
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:V])
    def lp(t):
        return -np.log((vocab.get(t, 0) + 1.0) / (n + V + 1.0))
    for i, d in enumerate(docs):
        ts = d.lower().split()
        if not ts:
            assert i not in got.index  # empty doc emits no row
        else:
            assert abs(got[i] - round(np.mean([lp(t) for t in ts]), 6)) < 1e-9


def test_repetition_signals_planted(ray_session):
    """Planted repetitive docs: hand-computed Gopher signals, plus the
    DuckDB twin on the same frame (multi-line docs exercise the line
    paths the synthetic corpus — single-line texts — never hits)."""
    import ray

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "aa bb\naa bb\ncc",          # 1 dup line of 3; 5/12 dup chars
                "x y x y x y",                # top 2-gram "x y" dominates
                "one two three four",         # no repetition at all
                "",                           # degenerate empty doc
            ],
        }
    )
    out = (
        textops.repetition_signals(ray.data.from_pandas(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1: lines [aa bb, aa bb, cc] -> dup_line_frac 1/3, chars 5/12
    assert out.loc[0, "dup_line_frac"] == round(1 / 3, 6)
    assert out.loc[0, "dup_line_char_frac"] == round(5 / 12, 6)
    # doc 2: tokens x y x y x y; top 2-gram "x y" (3 occurrences, 2 chars)
    # over 6 token chars -> 1.0; 3-grams "x y x"(2), "y x y"(2) all dup ->
    # occurrence-weighted (2*3 + 2*3)/6 = 2.0 (documented can exceed 1)
    assert out.loc[1, "top_2gram_char_frac"] == 1.0
    assert out.loc[1, "dup_3gram_char_frac"] == 2.0
    # doc 3: no repeats
    assert out.loc[2, "dup_line_frac"] == 0.0
    assert out.loc[2, "dup_3gram_char_frac"] == 0.0
    # doc 4: empty -> all zeros, no NaN/inf
    assert (out.loc[3, out.columns[1:]] == 0.0).all()

    import duckdb

    from kgraft.queries import ORACLE_SQL

    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(ORACLE_SQL["repetition_docs"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], want[sorted(want.columns)], check_dtype=False
    )

    # a block where EVERY doc is token-less (all-empty findall lists
    # concatenate to float64 without the object-dtype pin) must not crash
    no_tok = pd.DataFrame({"doc_id": [9, 10], "text": ["!!!", "..."]})
    out2 = textops.repetition_signals(ray.data.from_pandas(no_tok)).to_pandas()
    assert (out2[out2.columns[1:]] == 0.0).all().all()


def test_tokenize_docs_matches_bruteforce(ray_session):
    """Vocab cut + id encoding vs a straight-line oracle: top-V by
    (count desc, token asc), ids 1..V in that order, OOV -> 0."""
    import ray

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat sat on the mat",
                "the dog ate the cat food",
                "zebra quagga zebra",
                "",
            ],
        }
    )
    V = 5
    got = (
        textops.tokenize_docs(ray.data.from_pandas(docs), vocab_size=V)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # straight-line oracle
    import collections
    import re as _re

    cnt = collections.Counter()
    for t in docs["text"]:
        cnt.update(_re.findall(r"[a-z0-9_]+", t.lower()))
    vocab = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    ids = {tok: i + 1 for i, (tok, _) in enumerate(vocab)}
    for row, text in zip(got.itertuples(), docs["text"]):
        toks = _re.findall(r"[a-z0-9_]+", text.lower())
        assert row.n_tokens == len(toks)
        assert list(row.input_ids) == [ids.get(t, 0) for t in toks]
    # "the" is the most frequent -> id 1; OOVs present (V < vocab)
    assert ids["the"] == 1
    assert any(0 in list(r) for r in got["input_ids"])


def test_near_dup_clean_corpus_all_singletons(ray_session):
    """A corpus with NO near-duplicates (zero LSH candidates) must yield
    one singleton group per doc — this path used to KeyError on the
    column-less empty candidate frame (review r2)."""
    import ray

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                f"completely distinct document {i} about "
                + w * 3
                for i, w in enumerate(
                    ["kelp forests ", "granite peaks ", "meteor showers ",
                     "violin bows ", "desert dunes ", "arctic floes "]
                )
            ],
        }
    )
    out = textops.near_dup_groups(ray.data.from_pandas(docs), threshold=0.9).to_pandas()
    assert len(out) == 6
    assert out["dup_group"].nunique() == 6


def test_simhash_near_dup_giant_cluster(ray_session):
    """A duplicate cluster LARGER than the 256-per-bucket cap must still
    collapse to one group (star reduction over identical fingerprints —
    previously every pair was dropped and 300 singletons came back)."""
    import ray

    text = "the exact same document body repeated verbatim across the corpus"
    docs = pd.DataFrame({"doc_id": range(300), "text": [text] * 300})
    out = textops.simhash_near_dup(ray.data.from_pandas(docs), max_hamming=3).to_pandas()
    assert out["dup_group"].nunique() == 1
    assert (out["dup_group"] == 0).all()


def test_bm25_search_matches_bruteforce(ray_session):
    """BM25 ranking equals a straight-line numpy implementation of the
    same formula over the whole corpus."""
    import math

    import ray

    rng = np.random.default_rng(3)
    vocab = ["sort", "merge", "stream", "hash", "scan", "table"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(200)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"), "text": texts})
    terms = ["sort", "merge"]
    got = textops.bm25_search(ray.data.from_pandas(docs), terms, k=10)

    # brute force
    n = len(docs)
    dl = np.array([len(t) for t in texts], dtype=float)
    avgdl = dl.mean()
    tf = np.array([[t.count(term) for term in terms] for t in texts], dtype=float)
    df = (tf > 0).sum(axis=0)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    norm = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
    scores = ((idf * tf * 2.2) / (tf + norm[:, None])).sum(axis=1)
    exp = (
        pd.DataFrame({"doc_id": docs["doc_id"], "score": np.round(scores, 4)})
        .query("score > 0")
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_remove_duplicate_segments_newline(ray_session):
    """Within-doc repeated-LINE removal (the real MassiveText shape):
    first occurrence kept in order, empty text survives, multi-block."""
    import ray

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha\nbeta\nalpha\ngamma\nbeta",
                "same\nsame\nsame",
                "",
                "one line only",
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        textops.remove_duplicate_segments(ds, sep="\n")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["text"].tolist() == [
        "alpha\nbeta\ngamma",
        "same",
        "",
        "one line only",
    ]


def test_remove_frequent_segments_boilerplate(ray_session):
    """Cross-doc boilerplate removal: a footer line in >= 60% of docs
    is stripped everywhere; a doc that is ALL boilerplate collapses to
    '' but keeps its row; rare lines survive."""
    import ray

    footer = "(c) example corp"
    df = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": [f"body {i}\n{footer}" for i in range(9)] + [footer],
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = (
        textops.remove_frequent_segments(ds, sep="\n", min_frac=0.6, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["text"].tolist() == [f"body {i}" for i in range(9)] + [""]
    assert len(out) == 10


def test_dedup_segments_global_newline(ray_session):
    """Corpus-wide segment dedup: each line survives once, in its
    lowest-(doc, position) occurrence; docs that lose everything come
    back as '' with the row kept; reassembly preserves position order."""
    import ray

    df = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13],
            "text": [
                "shared\nunique-a\nshared",   # keeps shared (pos 0) + unique-a
                "unique-b\nshared",            # shared already owned by doc 10
                "shared",                      # -> ''
                "unique-c\nunique-d",
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        textops.dedup_segments_global(ds, sep="\n", num_buckets=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["text"].tolist() == [
        "shared\nunique-a",
        "unique-b",
        "",
        "unique-c\nunique-d",
    ]
    assert out["doc_id"].tolist() == [10, 11, 12, 13]


def test_dedup_spans_global_planted(ray_session):
    """Duplicated-span removal (k=3): the first (doc, pos) occurrence of
    a repeated 3-token window survives; later occurrences lose their
    covered tokens with overlapping windows unioned; docs shorter than k
    and unique text pass through untouched."""
    import ray

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d e",          # keeper of every window
                "x a b c d y",        # 'a b c' + 'b c d' dup -> union drops a b c d
                "a b c d e",          # full dup of doc 1 -> ''
                "q r",                # < k tokens, untouched
                "u v w u v w",        # within-doc repeat: 2nd 'u v w' window dup
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        textops.dedup_spans_global(ds, k=3, sep=" ", num_buckets=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out.loc[0, "text"] == "a b c d e"
    assert out.loc[1, "text"] == "x y"
    assert out.loc[2, "text"] == ""
    assert out.loc[3, "text"] == "q r"
    assert out.loc[4, "text"] == "u v w"
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]


def _ref_bpe(word_counts, n_merges):
    """Serial reference BPE (Sennrich et al.): same conventions as the
    engine — char symbols + '</w>', overlapping pair counts weighted by
    word frequency, left-to-right non-overlapping merge, (count desc,
    pair asc) tie-break, stop when the best pair count < 2."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        best_pair, best_cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_cnt < 2:
            break
        merges.append((best_pair[0], best_pair[1], best_cnt))
        a, b = best_pair
        for w, syms in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
    return merges


def test_bpe_train_vs_reference(ray_session):
    """Distributed BPE merges must equal the serial reference on a
    corpus with a clear frequency gradient, across block boundaries."""
    import re

    import ray

    texts = [
        "low low low lower lower newest newest newest",
        "newest newest widest widest low lowest",
        "new new new news news",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df).repartition(3)
    got = textops.bpe_train(ds, n_merges=6)

    wc = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9_]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    want = _ref_bpe(wc, 6)
    assert list(zip(got["left"], got["right"], got["pair_count"])) == want
    assert got["rank"].tolist() == list(range(len(want)))


def test_bpe_train_stops_when_dry(ray_session):
    """All-unique single-char words: no pair ever reaches count 2, so
    zero merges come back (no infinite loop, no count-1 merges)."""
    import ray

    df = pd.DataFrame({"doc_id": [0], "text": ["a b c d"]})
    got = textops.bpe_train(ray.data.from_pandas(df), n_merges=5)
    assert len(got) == 0


def test_near_dup_against_snapshot(ray_session):
    """Incremental near-dup: new docs that near-duplicate the prior
    snapshot flag true; fresh docs and the snapshot's own internal
    duplication stay out of scope."""
    import ray

    base = (
        "the gondar engine streams arrow batches through actor pools with "
        "backpressure and spills to the object store when memory is tight "
    )
    ref = pd.DataFrame(
        {
            "doc_id": [100, 101, 102],
            "text": [
                base * 4,
                base * 4,  # internal snapshot dup — must NOT affect output
                "prune the roses in late winter; mulch beds before the first frost",
            ],
        }
    )
    new = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                base * 4,                  # exact cross dup -> flagged
                base * 4 + " tail.",       # near cross dup -> flagged
                "the sicilian defence trades central space for dynamic play",
            ],
        }
    )
    out = (
        textops.near_dup_against(
            ray.data.from_pandas(new).repartition(2),
            ray.data.from_pandas(ref).repartition(2),
            threshold=0.7,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["near_dup"].tolist() == [True, True, False]
    assert out["doc_id"].tolist() == [0, 1, 2]


def test_c4_clean_planted(ray_session):
    """C4 rules on realistic planted pages: line tier drops short /
    unterminated / javascript lines; page tier drops lorem-ipsum,
    curly-brace, and under-3-sentence pages."""
    import ray

    good = (
        "This is the first proper sentence of the page.\n"
        "short line.\n"
        "Here is another complete sentence with enough words.\n"
        "a line without terminal punctuation and enough words here\n"
        "Enable javascript to view this page properly now.\n"
        "Finally a third full sentence closes the page!"
    )
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                good,
                good + "\nAlso some lorem ipsum filler text here.",
                good + "\nfunction f() { return 1; }",
                "Only one full sentence lives on this page.",
            ],
        }
    )
    out = (
        textops.c4_clean(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want_text = (
        "This is the first proper sentence of the page.\n"
        "Here is another complete sentence with enough words.\n"
        "Finally a third full sentence closes the page!"
    )
    assert out.loc[0, "text"] == want_text
    assert bool(out.loc[0, "kept"]) is True
    assert bool(out.loc[1, "kept"]) is False   # lorem ipsum
    assert bool(out.loc[2, "kept"]) is False   # curly brace
    assert bool(out.loc[3, "kept"]) is False   # < 3 sentences


def test_fuzzy_pairs_ed1_vs_bruteforce(ray_session):
    """FastSS deletion blocking must find exactly the brute-force
    edit-distance<=1 pairs (including indel pairs), and reject the
    shared-variant distance-2 false positives."""
    import ray

    names = {
        1: "kitten",
        2: "sitten",    # sub -> ED 1 from kitten
        3: "kittn",     # del -> ED 1 from kitten
        4: "kittens",   # ins -> ED 1 from kitten
        5: "mitten",    # ED 1 from kitten and sitten
        6: "sittin",    # ED 1 from sitten; ED 2 from kitten (shared variant trap)
        7: "banana",
    }
    df = pd.DataFrame({"k": list(names), "name": list(names.values())})
    got = (
        textops.fuzzy_pairs_ed1(
            ray.data.from_pandas(df).repartition(3), "k", "name", num_buckets=4
        )
        .to_pandas()
        .sort_values(["key_a", "key_b"], ignore_index=True)
    )
    want = []
    ks = list(names)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            if textops._ed_le1(names[ks[i]], names[ks[j]]):
                want.append((min(ks[i], ks[j]), max(ks[i], ks[j])))
    want = sorted(want)
    assert list(zip(got["key_a"], got["key_b"])) == want
    assert (1, 6) not in want  # distance-2 trap really is distance 2
    assert (1, 2) in want and (1, 3) in want and (1, 4) in want


def test_gopher_rules_planted(ray_session):
    """Each Gopher rule trips on a purpose-built page while a clean
    page passes all six."""
    import ray

    clean = " ".join(
        ["the quick brown fox jumps over that lazy dog with vigor"] * 6
    )  # 60 words, stop words 'the'/'that'/'with', mean wl ~4
    pages = {
        1: clean,                                        # kept
        2: "word " * 10,                                 # too few words
        3: clean + " " + "#### " * 20,                   # symbol ratio
        4: "\n".join(["- bullet item here ok"] * 20),    # bullets + few words
        5: clean.replace("the", "123").replace("that", "456").replace("with", "789"),  # no stops
    }
    df = pd.DataFrame({"doc_id": list(pages), "text": list(pages.values())})
    out = (
        textops.gopher_rules(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "kept"]) is True
    assert bool(out.loc[2, "kept"]) is False
    assert bool(out.loc[3, "kept"]) is False and out.loc[3, "sym_ratio"] > 0.1
    assert bool(out.loc[4, "kept"]) is False and out.loc[4, "bullet_frac"] == 1.0
    assert bool(out.loc[5, "kept"]) is False and out.loc[5, "n_stop"] < 2


def test_canonicalize_urls(ray_session):
    """Canonicalization collapses scheme/host case, default ports,
    fragments, tracking params, param order, and trailing slashes;
    distinct resources stay distinct."""
    import ray

    urls = [
        "HTTP://Example.COM:80/a/b/",                       # case+port+slash
        "http://example.com/a/b",                           # same resource
        "https://example.com/p?b=2&a=1&utm_source=x#frag",  # params+frag
        "https://example.com/p?a=1&b=2",                    # same resource
        "https://example.com:8443/p",                       # nonstandard port kept
        "https://example.com/other",
    ]
    df = pd.DataFrame({"url": urls})
    out = (
        textops.canonicalize_urls(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
    )
    c = dict(zip(out["url"], out["canon_url"]))
    assert c[urls[0]] == c[urls[1]] == "http://example.com/a/b"
    assert c[urls[2]] == c[urls[3]] == "https://example.com/p?a=1&b=2"
    assert ":8443" in c[urls[4]]
    assert c[urls[5]] != c[urls[1]]


def test_tokenize_detokenize_round_trip(ray_session):
    """detokenize(tokenize(docs)) == space-joined tokens with OOV as
    <unk> — the encode path's inverse under the shared vocab."""
    import re

    import ray

    from kgraft.textops import build_token_vocab, detokenize_docs, tokenize_docs

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype="int64"),
            "text": [
                "alpha beta gamma alpha",
                "beta beta RARE1 delta",
                "ALPHA unseen2 beta",
                "",
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    vocab = build_token_vocab(ds, vocab_size=4)  # alpha/beta + 2 more
    enc = tokenize_docs(ds, vocab_size=4)
    dec = (
        detokenize_docs(enc, vocab)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    kept = set(vocab["token"])
    for _, row in df.iterrows():
        toks = re.findall(r"[a-z0-9_]+", row["text"].lower())
        want = " ".join(t if t in kept else "<unk>" for t in toks)
        got_rows = dec[dec["doc_id"] == row["doc_id"]]
        if not toks:
            # zero-token docs round-trip as empty text (or no row if the
            # encoder drops them) — accept either, but never garbage
            assert got_rows.empty or got_rows.iloc[0]["text"] == ""
        else:
            assert got_rows.iloc[0]["text"] == want, row["text"]


def test_cms_token_counts_bounds(ray_session):
    """CMS estimates: never below the exact count, within eps*N above
    it (eps = e/width), and invariant to block layout (grids merge by
    sum)."""
    import re

    import ray

    from kgraft.textops import cms_token_counts

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(300)]
    weights = 1.0 / np.arange(1, 301)  # Zipf
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, 40, p=weights)) for _ in range(300)
    ]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype="int64"), "text": texts})

    exact = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9_]+", t):
            exact[w] = exact.get(w, 0) + 1
    total = sum(exact.values())
    probes = ["w0", "w1", "w50", "w299", "absent_token"]

    got = cms_token_counts(
        ray.data.from_pandas(df).repartition(6), probes, width=1024, depth=4
    )
    eps_n = np.e / 1024 * total
    for _, row in got.iterrows():
        true = exact.get(row["token"], 0)
        assert row["est_count"] >= true
        assert row["est_count"] <= true + eps_n
    assert got["total_tokens"].iloc[0] == total

    got2 = cms_token_counts(ray.data.from_pandas(df), probes, width=1024, depth=4)
    assert got["est_count"].tolist() == got2["est_count"].tolist()


def test_chunk_documents_overlap_and_edges(ray_session):
    import ray
    import pandas as pd
    from kgraft.textops import chunk_documents

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a" * 1000, "b" * 400, "", "xy"],
        }
    )
    out = (
        chunk_documents(ray.data.from_pandas(df), size=500, stride=400)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )
    # doc 1: ceil(1000/400)=3 chunks at offsets 0/400/800 (lens 500/500/200)
    # doc 2: 1 chunk (len 400); doc 3: none; doc 4: 1 chunk (len 2)
    got = out.groupby("doc_id")["chunk_idx"].count().to_dict()
    assert got == {1: 3, 2: 1, 4: 1}
    d1 = out[out["doc_id"] == 1]
    assert list(d1["n_chars"]) == [500, 500, 200]
    # consecutive chunks overlap by size - stride = 100 chars
    full = "a" * 1000
    for _, r in d1.iterrows():
        k = r["chunk_idx"]
        assert r["chunk_text"] == full[k * 400 : k * 400 + 500]
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(ray.data.from_pandas(df), size=0, stride=400)


def test_filter_blocked_hosts_suffix_semantics(ray_session):
    import ray

    from kgraft.textops import filter_blocked_hosts

    urls = [
        "https://site3.example/page/1",       # exact host block
        "https://a.site3.example/x",          # subdomain of blocked
        "https://notsite3.example/x",         # lookalike must SURVIVE
        "https://site4.example/x",            # unblocked
        "http://BLOCKED.org/y",               # case-insensitive host
        "https://deep.sub.blocked.org/z",     # deep subdomain
        "https://blocked.org.evil.com/z",     # suffix trick must SURVIVE
        "https://other.org/ok",
    ]
    df = pd.DataFrame({"url": urls, "i": range(len(urls))})
    ds = ray.data.from_pandas(df).repartition(3)
    kept = (
        filter_blocked_hosts(ds, ["site3.example", "blocked.org"])
        .to_pandas()["url"]
        .tolist()
    )
    assert sorted(kept) == sorted(
        [
            "https://notsite3.example/x",
            "https://site4.example/x",
            "https://blocked.org.evil.com/z",
            "https://other.org/ok",
        ]
    )
    audit = (
        filter_blocked_hosts(ds, ["site3.example", "blocked.org"],
                             keep_blocked=True)
        .to_pandas()["url"]
        .tolist()
    )
    assert len(audit) == 4 and "https://site3.example/page/1" in audit


def test_cms_sketch_tables_merge_equals_direct(ray_session):
    import ray

    from kgraft.textops import cms_estimate_from_sketches, cms_sketch_table

    a = pd.DataFrame({"text": ["the cat sat", "the dog ran"] * 50})
    b = pd.DataFrame({"text": ["the cat ate the fish"] * 30})
    ska = cms_sketch_table(ray.data.from_pandas(a).repartition(3))
    skb = cms_sketch_table(ray.data.from_pandas(b).repartition(2))
    merged = cms_estimate_from_sketches(
        pd.concat([ska, skb], ignore_index=True), ["the", "cat", "fish"]
    )
    direct = cms_estimate_from_sketches(
        cms_sketch_table(ray.data.from_pandas(pd.concat([a, b]))),
        ["the", "cat", "fish"],
    )
    pd.testing.assert_frame_equal(merged, direct)
    # CMS never undercounts; at this tiny load it is exact
    est = dict(zip(merged["token"], merged["merged_est" if "merged_est" in merged else "est_count"]))
    assert est["the"] == 160 and est["cat"] == 80 and est["fish"] == 30

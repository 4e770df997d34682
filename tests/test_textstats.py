"""Language ID, quality counters, token counts, fingerprints."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.functions.minhash import fingerprint
from ocr_search_ray.stages.textstats import (
    detect_lang,
    fingerprints,
    lang_id,
    quality_stats,
    token_counts,
)


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_detect_lang_heuristic():
    assert detect_lang("the cat is on the mat and it is warm") == "en"
    assert detect_lang("der hund ist nicht auf der straße und das ist gut") == "de"
    assert detect_lang("el perro es grande y la casa es de madera") == "es"
    assert detect_lang("le chat est dans la maison et il est content") == "fr"
    assert detect_lang("这是一个中文句子这是一个中文句子") == "zh"
    assert detect_lang("") == "unknown"
    assert detect_lang("zzz qqq xxx") == "unknown"


def test_lang_id_stage():
    out = {r["doc_id"]: r["pred_lang"]
           for r in lang_id(_docs(["the cat is here", "中文内容中文内容中文"])).take_all()}
    assert out == {0: "en", 1: "zh"}


def test_quality_stats_counters():
    (row,) = quality_stats(_docs(["the cat  sat"])).take_all()
    # split(' ') with empty removed → [the, cat, sat]
    assert row["n_chars"] == len("the cat  sat")
    assert row["n_tokens"] == 3
    assert row["n_stopwords"] == 1  # 'the'
    assert row["n_types"] == 3
    assert row["sum_token_len"] == 9


def test_token_counts():
    (row,) = token_counts(_docs(["ab3cd e-f"])).take_all()
    assert row["n_ws_tokens"] == 2
    assert row["n_re_tokens"] == 5  # ab / 3 / cd / e / f


def test_fingerprints_deterministic_and_match_function():
    texts = ["one two three four five six seven", "short"]
    out = {r["doc_id"]: r["fingerprint"] for r in fingerprints(_docs(texts)).take_all()}
    assert out[0] == fingerprint(texts[0])
    assert out[1] == fingerprint("short")  # <5 words → whole-text md5


def test_ngram_counts_exact():
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.textstats import ngram_counts

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c a b", "b c  a"]),  # double space skipped
        }
    )
    got = {r["ngram"]: r["count"]
           for r in ngram_counts(rd.from_arrow(docs).repartition(2)).take_all()}
    assert got == {"a b": 2, "b c": 2, "c a": 2}


def test_domain_stats_counts_pages_and_distinct_urls():
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.textstats import domain_stats

    pages = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.example/x", "https://a.example/x",
                    "https://a.example/y", "https://b.example/z",
                ]
            )
        }
    )
    got = {r["domain"]: (r["n_pages"], r["n_urls"])
           for r in domain_stats(rd.from_arrow(pages).repartition(3)).take_all()}
    assert got == {"a.example": (3, 2), "b.example": (1, 1)}


def test_winnowing_shared_run_guarantee():
    """Schleimer et al. guarantee: two docs sharing a word run of length
    >= window + k - 1 (= 6 at defaults) share at least one fingerprint;
    fully word-disjoint docs share none."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.textstats import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared words
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    f"one two {shared} three four five",
                    f"six seven eight {shared} nine",
                    "p q r s t u v w x y z aa bb cc",
                ]
            ),
        }
    )
    out = winnowing_fingerprints(rd.from_arrow(docs)).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_approx_distinct_within_hll_error_bounds():
    """HLL estimate vs exact distinct on 20k values with heavy duplication:
    within 3x the theoretical standard error (1.04/sqrt(m)); deterministic
    across partitionings."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.textstats import approx_distinct

    n_distinct = 7000
    vals = [f"url-{i % n_distinct}" for i in range(20000)]
    ds = rd.from_arrow(pa.table({"u": pa.array(vals)})).repartition(8)
    est = approx_distinct(ds, "u").to_pylist()[0]["estimate"]
    rel_err = abs(est - n_distinct) / n_distinct
    assert rel_err < 3 * 1.04 / (1 << 6), f"est {est} err {rel_err:.3f}"

    # partitioning-independent determinism
    est2 = approx_distinct(ds.repartition(3), "u").to_pylist()[0]["estimate"]
    assert est2 == est


def test_repetition_stats_hand_cases():
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.textstats import repetition_stats

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["", "spam spam spam", "a bb a  bb a"]),
            }
        )
    )
    got = {r["doc_id"]: r for r in repetition_stats(ds).take_all()}
    assert got[0] == {
        "doc_id": 0, "n_words": 0, "n_distinct_words": 0,
        "top_word_count": 0, "dup_word_chars": 0, "n_2grams": 0,
        "n_distinct_2grams": 0, "top_2gram_count": 0,
    }
    # "spam spam spam": 3 words 1 distinct; dup chars 4*3; bigrams
    # ["spam spam"]*2
    assert got[1]["n_words"] == 3
    assert got[1]["n_distinct_words"] == 1
    assert got[1]["top_word_count"] == 3
    assert got[1]["dup_word_chars"] == 12
    assert got[1]["n_2grams"] == 2
    assert got[1]["n_distinct_2grams"] == 1
    assert got[1]["top_2gram_count"] == 2
    # double space: empty token dropped; words = a bb a bb a
    assert got[2]["n_words"] == 5
    assert got[2]["n_distinct_words"] == 2
    assert got[2]["top_word_count"] == 3
    assert got[2]["dup_word_chars"] == 3 * 1 + 2 * 2
    assert got[2]["n_2grams"] == 4
    assert got[2]["n_distinct_2grams"] == 2
    assert got[2]["top_2gram_count"] == 2


def test_substring_search_matches_python_in():
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.stages.textstats import substring_search

    texts = [
        "alpha merge batch gamma",     # hit
        "merge alpha batch",           # trigram FP candidate, not a hit
        "nothing here",
        "xmerge batchy",               # substring inside words still hits
        "",
    ]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    ).repartition(3)
    got = sorted(r["doc_id"] for r in
                 substring_search(ds, "merge batch").take_all())
    assert got == [i for i, t in enumerate(texts) if "merge batch" in t]
    # short-pattern fallback (no trigram)
    got2 = sorted(r["doc_id"] for r in
                  substring_search(ds, "xm").take_all())
    assert got2 == [i for i, t in enumerate(texts) if "xm" in t]


def test_bigram_familiarity_exact_counts():
    """Hand-checkable corpus: familiarity = sum of corpus bigram counts
    over each doc's bigram occurrences; zero-bigram docs emit exact 0s."""
    from ocr_search_ray.stages.textstats import bigram_familiarity

    texts = [
        "a b a b",        # bigrams: (a b)x2, (b a)x1
        "a b c",          # (a b), (b c)
        "solo",           # 0 bigrams
        "",               # 0 bigrams
        "a  b",           # double space → tokens [a, b] → (a b)
    ]
    # corpus counts: "a b"=4, "b a"=1, "b c"=1
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    ).repartition(3)
    got = {r["doc_id"]: (r["n_bigrams"], r["familiarity_sum"])
           for r in bigram_familiarity(ds).take_all()}
    assert got == {
        0: (3, 2 * 4 + 1),   # two (a b) worth 4 each + one (b a) worth 1
        1: (2, 4 + 1),
        2: (0, 0),
        3: (0, 0),
        4: (1, 4),
    }


def test_domain_cap_truncates_hot_hosts():
    from ocr_search_ray.stages.textstats import domain_cap

    urls = [f"https://hot.example.com/p{i:03d}" for i in range(40)] + \
           [f"https://cold.example.org/p{i:03d}" for i in range(3)]
    ds = rd.from_arrow(
        pa.table({"url": pa.array(urls),
                  "doc_id": pa.array(range(len(urls)), pa.int64())})
    ).repartition(4)
    got = domain_cap(ds, 5).take_all()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r["url"])
    assert sorted(by_dom["hot.example.com"]) == [
        f"https://hot.example.com/p{i:03d}" for i in range(5)]  # first 5 by url
    assert len(by_dom["cold.example.org"]) == 3  # under the cap: untouched


def test_quality_filter_rules_and_reasons():
    from ocr_search_ray.stages.textstats import quality_filter

    texts = {
        0: " ".join(["informative"] * 15 + ["the a of to in is was for on"]
                    * 3),                     # long enough, stopwordy, typed?
        1: "tiny doc",                        # too_short
        2: " ".join("word%02d" % i for i in range(40)),   # no stopwords
        3: " ".join(["dup"] * 40),            # repetitive → ttr fails (+stop)
        4: " ".join(["ab"] * 30 + ["the"] * 10),  # mean token len < 3
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
    })).repartition(2)
    got = {r["doc_id"]: (r["keep"], r["reasons"])
           for r in quality_filter(ds).take_all()}
    assert len(got) == len(texts)             # one verdict per doc, always
    assert got[1] == (False, "too_short,stopword_ratio")  # 0 stopwords too
    assert got[2] == (False, "stopword_ratio")
    assert got[3][0] is False and "ttr" in got[3][1]
    assert got[4][0] is False and "mean_len" in got[4][1]
    # doc 0: 42 tokens, 9/42 stopwords >= 1/25, ttr 10/42 < 3/10 → ttr fail?
    # types: informative + 9 distinct stopwords = 10; 10*10 < 42*3 → fails ttr
    assert got[0] == (False, "ttr")

def test_collocations_matches_brute_force():
    """collocations vs a literal Counter replay — integer lift lattice,
    min_count prune, multi-space/empty-token convention."""
    import ray.data as rd
    from collections import Counter
    from ocr_search_ray.stages.textstats import collocations

    texts = [
        "a b a b c", "a b  x", "b c a b", "x y", "",
        "a b c a b", None,
    ]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)
    got = {(r["w1"], r["w2"]): (r["pair_n"], r["w1_n"], r["w2_n"],
                                r["lift_scaled"])
           for r in collocations(ds, min_count=2).take_all()}

    uni, big = Counter(), Counter()
    for t in texts:
        toks = [w for w in (t or "").split(" ") if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    exp = {}
    for (w1, w2), c in big.items():
        if c >= 2:
            exp[(w1, w2)] = (c, uni[w1], uni[w2],
                             (10**9 * c) // uni[w1] // uni[w2])
    assert got == exp
    assert ("a", "b") in got and got[("a", "b")][0] == 6

def test_grouped_mad_matches_brute_force():
    """grouped_mad vs a literal replay — selection ranks, Hampel count,
    all-equal group (mad 0 → every dev 0 is NOT an outlier)."""
    import math
    import ray.data as rd
    from ocr_search_ray.stages.relational import grouped_mad

    rows = [("a", v) for v in [1.0, 2.0, 100.0, 3.0, 2.5, -7.0]]
    rows += [("b", 5.0)] * 4                    # mad 0, no outliers
    rows += [("c", v) for v in [10.0, 10.0, 10.0, 10.0, 10.0, 99.0]]
    ds = rd.from_items(
        [{"event_type": k, "value": v} for k, v in rows]
    ).repartition(3)
    got = {r["event_type"]: (r["med"], r["mad"], r["n"], r["n_outliers"])
           for r in grouped_mad(ds, ["event_type"], "value").take_all()}

    exp = {}
    for k in ("a", "b", "c"):
        vals = sorted(v for kk, v in rows if kk == k)
        n = len(vals)
        med = vals[max(1, math.ceil(0.5 * n)) - 1]
        dev = sorted(abs(v - med) for v in vals)
        mad = dev[max(1, math.ceil(0.5 * n)) - 1]
        out = sum(1 for v in vals if abs(v - med) > 3.0 * mad)
        exp[k] = (med, mad, n, out)
    assert got == exp
    assert got["b"] == (5.0, 0.0, 4, 0)
    assert got["c"][3] == 1                     # the planted 99.0

def test_domain_ngrams_topk_per_host():
    """domain_ngrams vs a literal replay — per-host counts, (count desc,
    ngram asc) tie order, k cut."""
    import ray.data as rd
    from collections import Counter
    from urllib.parse import urlsplit
    from ocr_search_ray.stages.textstats import domain_ngrams

    rows = [
        ("https://a.example/1", "x y x y z"),
        ("https://a.example/2", "x y q"),
        ("https://b.example/1", "p q p q p"),
    ]
    ds = rd.from_items(
        [{"url": u, "text": t} for u, t in rows]
    ).repartition(2)
    got = {(r["domain"], r["ngram"]): r["count"]
           for r in domain_ngrams(ds, n=2, k=2).take_all()}

    cnt = Counter()
    for u, t in rows:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            cnt[(urlsplit(u).netloc, f"{a} {b}")] += 1
    exp = {}
    for dom in {d for d, _ in cnt}:
        top = sorted(((g, c) for (d, g), c in cnt.items() if d == dom),
                     key=lambda x: (-x[1], x[0]))[:2]
        for g, c in top:
            exp[(dom, g)] = c
    assert got == exp
    assert got[("a.example", "x y")] == 3

"""BPE training/encoding semantics (stages/bpe.py).

Pins: overlap pair counting, lexicographic tie-break, left-to-right merge
application, rank-ordered encoding that reproduces training segmentation,
the max_types driver cap, and the planted-corpus oracle derivation used by
the bpe_train / bpe_encode entries.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_search_ray.stages.bpe import (
    _apply_merge,
    _BpeEncoder,
    bpe_encode,
    bpe_train,
    word_frequencies,
)

SF = "/root/testdata/sf0.001"


def _freq_ds(vocab: dict[str, int]):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "word": pa.array(list(vocab.keys()), pa.string()),
        "count": pa.array(list(vocab.values()), pa.int64()),
    }))


def _merge_rows(t: pa.Table):
    return list(zip(
        t.column("merge_rank").to_pylist(),
        t.column("lhs").to_pylist(),
        t.column("rhs").to_pylist(),
        t.column("pair_count").to_pylist(),
    ))


def test_apply_merge_left_to_right_nonoverlapping():
    assert _apply_merge(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _apply_merge(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _apply_merge(("x", "y", "x"), "x", "y") == ("xy", "x")


def test_hand_computed_merge_sequence():
    # vocab {"aaab": 2, "ab": 3}; overlap counting:
    #   (a,a): 2 per "aaab" -> 4;  (a,b): 1*2 + 1*3 = 5  -> merge 1 = (a,b)@5
    # after: "aaab" -> (a,a,ab), "ab" -> (ab,)
    #   (a,a): 2, (a,ab): 2 -> tie, lexicographic -> merge 2 = (a,a)@2
    t = bpe_train(_freq_ds({"aaab": 2, "ab": 3}), n_merges=2)
    assert _merge_rows(t) == [(1, "a", "b", 5), (2, "a", "a", 2)]


def test_tie_break_lexicographic():
    t = bpe_train(_freq_ds({"ab": 1, "cd": 1}), n_merges=1)
    assert _merge_rows(t) == [(1, "a", "b", 1)]


def test_merge_loop_stops_when_no_pairs_left():
    t = bpe_train(_freq_ds({"ab": 3}), n_merges=10)
    # one merge fuses the only word to a single symbol; loop stops early
    assert _merge_rows(t) == [(1, "a", "b", 3)]


def test_max_types_cap_drops_rare_types():
    # cap keeps top-2 types by (count desc, word asc): "aa"@5, "bb"@3;
    # "ccc" never reaches the driver, so no c-pairs can win a rank.
    t = bpe_train(_freq_ds({"aa": 5, "bb": 3, "ccc": 1}),
                  n_merges=3, max_types=2)
    rows = _merge_rows(t)
    assert [r[1:3] for r in rows] == [("a", "a"), ("b", "b")]


def test_n_merges_validated():
    with pytest.raises(ValueError):
        bpe_train(_freq_ds({"ab": 1}), n_merges=0)


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1,
    max_size=12))
def test_encode_concatenation_reproduces_word(words):
    # train on the words themselves, then encoding any of them must
    # concatenate back to the original characters (lossless segmentation)
    vocab: dict[str, int] = {}
    for i, w in enumerate(words):
        vocab[w] = vocab.get(w, 0) + i + 1
    merges = []
    enc_vocab = {tuple(w): c for w, c in vocab.items()}
    # reference trainer: plain dict implementation, no Ray
    for rank in range(1, 6):
        pairs: dict = {}
        for syms, cnt in enc_vocab.items():
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        (l, r), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r))
        enc_vocab = {_apply_merge(s, l, r): c for s, c in enc_vocab.items()}
    enc = _BpeEncoder(merges)
    for w in words:
        assert "".join(enc._encode(w)) == w


def test_encoder_reproduces_training_segmentation():
    # in-vocabulary words segment exactly as the trainer left them
    vocab = {"aaab": 2, "ab": 3}
    t = bpe_train(_freq_ds(vocab), n_merges=2)
    merges = list(zip(t.column("merge_rank").to_pylist(),
                      t.column("lhs").to_pylist(),
                      t.column("rhs").to_pylist()))
    enc = _BpeEncoder(merges)
    # merges: (a,b) then (a,a) -> "aaab" = (aa, ab), "ab" = (ab,)
    assert enc._encode("aaab") == ("aa", "ab")
    assert enc._encode("ab") == ("ab",)
    # memo returns the identical tuple on re-encode
    assert enc._encode("aaab") is enc._encode("aaab")


def test_word_frequencies_exact():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["x y  x", "y x\tz"], pa.string()),
    }))
    out = word_frequencies(ds).take_all()
    counts = {r["word"]: r["count"] for r in out}
    assert counts == {"x": 3, "y": 2, "z": 1}


def test_planted_corpus_entries_match_analytic_oracle():
    # the q_bpe_train / q_bpe_encode derivation, end-to-end at sf0.001
    from ocr_search_ray.pipelines import queries as q

    train = q.q_bpe_train(SF)
    rows = _merge_rows(train)
    import duckdb

    na, nb = duckdb.sql(
        f"SELECT SUM(5 + doc_id % 3), SUM(3 + doc_id % 2) FROM "
        f"'{SF}/documents.parquet'").fetchone()
    assert rows == [
        (1, "a", "a", 3 * int(na)),
        (2, "b", "b", 3 * int(nb)),
        (3, "aa", "aa", int(na)),
        (4, "bb", "bb", int(nb)),
    ]

    enc = q.q_bpe_encode(SF).take_all()
    assert len(enc) > 0
    for r in enc:
        d = r["doc_id"]
        assert r["n_words"] == 9 + d % 3 + d % 2
        assert r["n_tokens"] == 12 + d % 3 + d % 2


def test_bpe_encode_out_of_vocab_word_still_segments():
    merges = [(1, "a", "a")]
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["aaa bqz"], pa.string()),
    }))
    t = pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int32()),
        "lhs": pa.array([m[1] for m in merges], pa.string()),
        "rhs": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([1] * len(merges), pa.int64()),
    })
    out = bpe_encode(ds, t).take_all()
    # "aaa" -> (aa, a) = 2 tokens; "bqz" has no merges -> 3 single chars
    assert out[0]["n_words"] == 2 and out[0]["n_tokens"] == 5


def test_bpe_train_driver_collect_bounded(monkeypatch):
    # the ONLY driver collect in bpe_train is the capped type table:
    # every take_all during training must return <= max_types rows
    import ray.data as rd

    collected: list[int] = []
    orig = rd.Dataset.take_all

    def spy(self, *a, **kw):
        rows = orig(self, *a, **kw)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(rd.Dataset, "take_all", spy)
    vocab = {f"w{i:03d}": i + 1 for i in range(64)}
    bpe_train(_freq_ds(vocab), n_merges=2, max_types=16)
    assert collected and all(n <= 16 for n in collected)

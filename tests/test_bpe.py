"""BPE training/encoding (l23/l23b) vs an independent pure-Python
reference implementation of the classic algorithm (Sennrich et al. 2016):
the distributed pipeline must learn the SAME merge table and produce the
SAME per-document token counts as the sequential reference."""

from __future__ import annotations

import re

import duckdb

from tests.conftest import SF_SMOKE

K = 8
_WORD = re.compile(r"^[a-z]+$")


def _word_freqs() -> dict[str, int]:
    rows = duckdb.sql(
        f"SELECT lower(text) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    freqs: dict[str, int] = {}
    for (text,) in rows:
        for w in text.split(" "):
            if _WORD.match(w):
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _merge(syms: tuple[str, ...], l: str, r: str) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge — the reference merge pass
    (identical greedy semantics to string replace on the wrapped form)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(freqs: dict[str, int], k: int):
    """Classic BPE trainer: argmax adjacent-pair count (weighted by word
    freq, overlapping positions counted), tie-break (count DESC, l, r)."""
    vocab = {tuple(w): f for w, f in freqs.items()}
    merges = []
    for _ in range(k):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + f
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        vocab = {_merge(s, l, r): f for s, f in vocab.items()}
    return merges, vocab


def test_l23_matches_reference_trainer(spark):
    from cassandra_spark.operators.llm_bpe import l23_bpe_train

    got = [
        (r.lhs, r.rhs, r.pair_count)
        for r in l23_bpe_train(spark, SF_SMOKE).collect()
    ]
    want, _ = _ref_train(_word_freqs(), K)
    assert got == want


def test_l23b_matches_reference_encoding(spark):
    from cassandra_spark.operators.llm_bpe import l23b_bpe_encode

    merges, _ = _ref_train(_word_freqs(), K)
    rows = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    want: dict[int, tuple[int, int, int]] = {}
    for doc_id, text in rows:
        words = [w for w in text.split(" ") if _WORD.match(w)]
        if not words:
            continue
        n_tok = 0
        for w in words:
            syms = tuple(w)
            for l, r, _ in merges:
                syms = _merge(syms, l, r)
            n_tok += len(syms)
        want[doc_id] = (len(words), n_tok, sum(len(w) for w in words))
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.n_chars)
        for r in l23b_bpe_encode(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_l23b_token_count_bounds(spark):
    """Subword counts are bracketed: one token per word at the floor (full
    merge), one per character at the ceiling (no merge applies) — and the
    8 learned merges must actually compress the corpus."""
    from cassandra_spark.operators.llm_bpe import l23b_bpe_encode

    rows = l23b_bpe_encode(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars
    total_tok = sum(r.n_bpe_tokens for r in rows)
    total_chars = sum(r.n_chars for r in rows)
    assert total_tok < total_chars


def test_merge_pass_greedy_semantics():
    """The [a,a,a,a] → [aa,aa] greedy pass — the case where naive
    single-space separators diverge from the wrapped-symbol form that both
    engines' replace() implement (module docstring)."""
    assert _merge(("a",) * 4, "a", "a") == ("aa", "aa")
    assert _merge(("a",) * 3, "a", "a") == ("aa", "a")
    assert "|a||a||a||a|".replace("|a||a|", "|aa|") == "|aa||aa|"

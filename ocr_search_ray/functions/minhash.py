"""Shingling, MinHash, SimHash, fingerprinting — deterministic, md5-based.

No equivalent exists in the reference (SURVEY.md §2.7: "No near-dedup");
these are the near-duplicate primitives a large-scale training-data pipeline
needs, added as first-class engine operators.

All hashes are md5 hex strings (stdlib, stable across platforms AND
reproducible inside ANSI SQL via DuckDB's ``md5`` — every operator built on
these functions has an exact relational oracle). At 100 TB one would swap in
a 64-bit xxhash for speed; the band/bucket algebra is unchanged.
"""

from __future__ import annotations

import hashlib


def words(text: str) -> list[str]:
    """Single-space split — matches SQL ``string_split(text, ' ')`` exactly
    (empty tokens preserved; downstream shingles use positions as-is)."""
    return text.split(" ")


def shingles(text: str, k: int = 3) -> set[str]:
    """Distinct word k-gram shingles (space-joined)."""
    ws = words(text)
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def minhash_signature(shingle_set: set[str], num_hashes: int = 16) -> list[str]:
    """mh[i] = min over shingles of md5(f"{i}:{shingle}").

    Salted-md5 permutations; min over lexicographic hex order (identical to
    SQL ``min(md5(i || ':' || shingle))``). Empty shingle set → [].
    """
    if not shingle_set:
        return []
    sig: list[str] = []
    for i in range(num_hashes):
        prefix = f"{i}:"
        sig.append(min(_md5(prefix + s) for s in shingle_set))
    return sig


def lsh_bands(signature: list[str], band_rows: int = 4) -> list[str]:
    """Band signatures: concatenation of ``band_rows`` consecutive hashes."""
    return [
        ",".join(signature[b : b + band_rows])
        for b in range(0, len(signature), band_rows)
    ]


def jaccard(a: set[str], b: set[str]) -> tuple[int, int]:
    """(intersection, union) sizes — exact integers, division left to caller."""
    inter = len(a & b)
    return inter, len(a) + len(b) - inter


def simhash64(term_freqs: dict[str, int]) -> int:
    """64-bit SimHash over weighted terms (Charikar 2002 semantics):
    bit b of the output is 1 iff the tf-weighted sum of (±1 per term's md5
    bit b) is positive. Returns an unsigned 64-bit int."""
    acc = [0] * 64
    for term, tf in term_freqs.items():
        h = int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:8], "big")
        for b in range(64):
            acc[b] += tf if (h >> b) & 1 else -tf
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def fingerprint(text: str, k: int = 5) -> str:
    """Document fingerprint: min md5 over word k-gram shingles (winnowing's
    0-th order cousin — one representative hash per document); whole-text md5
    when the document is shorter than k words."""
    sh = shingles(text, k)
    if not sh:
        return _md5(text)
    return min(_md5(s) for s in sh)

"""Identity hashing: file_id / doc_id derivation.

Reproduces the reference's id scheme (ocr_search
``src/PdfUtil/PdfUtil.class.js:55,66-70``):

- ``file_id = sha256(url)`` hex — url plays the role of ``oriFilePath`` in the
  web-page data model (SURVEY.md §1.4).
- ``doc_id = sha256(f"{url}-{page_idx padded}")`` hex, where the zero-pad width
  is ``len(str(page_count))`` — a 9-page file pads to 1 digit, a 10-page file
  to 2. Load-bearing for byte-identical reproduction (SURVEY.md §1.2).
- ``img_path = f"{doc_id}.png"`` — the post-rearrangement flat name
  (``src/ProcessDirector/ProcessDirector.class.js:140``).
"""

from __future__ import annotations

import hashlib


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def file_id(url: str) -> str:
    return sha256_hex(url)


def padded_page(page_idx: int, page_count: int) -> str:
    """Zero-pad ``page_idx`` to the width of ``str(page_count)``."""
    return str(page_idx).zfill(len(str(page_count)))


def doc_id(url: str, page_idx: int, page_count: int) -> str:
    return sha256_hex(f"{url}-{padded_page(page_idx, page_count)}")


def img_path(url: str, page_idx: int, page_count: int) -> str:
    return f"{doc_id(url, page_idx, page_count)}.png"


def sha256_hex_column(col, *, null_as: str = "") -> "object":
    """sha256 hexdigests of a string column → Arrow string array.

    Same buffer-walk shape as :func:`md5_digest_matrix`: one pass over
    the concatenated Arrow utf-8 buffer via memoryview slices — no
    per-row Python string allocation, no ``encode()`` (the Arrow buffer
    IS utf-8). Nulls hash as ``null_as`` (the ``t or ""`` convention of
    the dedup operators)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # The buffer walk below reads int32 offsets — valid ONLY for pa.string().
    # A large_string column (int64 offsets) would silently hash wrong slices,
    # so normalize the physical layout first (same guard md5_digest_matrix has).
    arr = pc.fill_null(col.cast(pa.string()), null_as)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    offs = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
    )
    data = memoryview(arr.buffers()[2])
    sha = hashlib.sha256
    return pa.array(
        [sha(data[offs[i]:offs[i + 1]]).hexdigest() for i in range(n)],
        pa.string(),
    )


def md5_digest_matrix(col) -> "object":
    """Full md5 digests of an Arrow column's string form → (n, 16) uint8
    numpy matrix.

    The ONE shared content-hash kernel behind ``hash_sample``,
    ``assign_split`` and ``stratified_sample`` (each derives its slice of
    the digest vectorized: first byte, first-4-bytes-mod-100, whole
    digest as rank). Values hash exactly as ``md5(str(value))`` — the SQL
    oracle form ``md5(CAST(col AS VARCHAR))`` — including the legacy
    ``str(None) == 'None'`` for nulls. One tight loop over the
    concatenated Arrow string buffer via memoryview slices: no per-row
    Python string objects, no ``to_pylist``.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.fill_null(col.cast(pa.string()), "None")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    out = np.empty((n, 16), dtype=np.uint8)
    if n == 0:
        return out
    offs = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
    )
    data = memoryview(arr.buffers()[2])
    md5 = hashlib.md5
    for i in range(n):
        out[i] = np.frombuffer(
            md5(data[offs[i]:offs[i + 1]]).digest(), dtype=np.uint8
        )
    return out


_CRC32_TABLE = None


def _crc32_table():
    """256-entry CRC-32 (IEEE 802.3, poly 0xEDB88320) lookup table —
    the same polynomial ``zlib.crc32`` implements, so the vectorized
    kernel below is bit-exact with the scalar recipe every bucketed
    layout in the repo is keyed on (``index.term_bucket``,
    ``dedup_disk.digest_bucket``)."""
    global _CRC32_TABLE
    if _CRC32_TABLE is None:
        import numpy as np

        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, 0xEDB88320 ^ (t >> 1), t >> 1).astype(np.uint32)
        _CRC32_TABLE = t
    return _CRC32_TABLE


def crc32_column(col) -> "object":
    """``zlib.crc32(row.encode())`` of every row of a string column →
    uint32 numpy array, without per-row Python strings.

    Fixed-width columns (the repo's 64-hex digest/doc_id columns) take a
    fully vectorized path: the concatenated utf-8 buffer reshapes to an
    ``(n, w)`` byte matrix and the table-driven CRC runs ``w`` numpy steps
    over all rows at once (VERDICT r4 design note on
    ``dedup_disk._hash_and_bucket``'s per-row loop). Ragged columns fall
    back to one ``zlib.crc32`` call per buffer slice — still no
    ``to_pylist``/``encode``. Bit-exact with ``zlib.crc32`` (property
    test: ``tests/test_properties.py``)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.fill_null(col.cast(pa.string()), "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    offs = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
    )
    widths = np.diff(offs)
    data_buf = arr.buffers()[2]
    if widths.min() == widths.max() and widths[0] > 0:
        w = int(widths[0])
        mat = np.frombuffer(
            data_buf, dtype=np.uint8, count=n * w, offset=int(offs[0])
        ).reshape(n, w)
        table = _crc32_table()
        crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
        for j in range(w):
            crc = table[(crc ^ mat[:, j]) & 0xFF] ^ (crc >> 8)
        return (crc ^ 0xFFFFFFFF).astype(np.uint32)
    import zlib

    data = memoryview(data_buf)
    return np.fromiter(
        (zlib.crc32(data[offs[i]:offs[i + 1]]) for i in range(n)),
        dtype=np.uint32,
        count=n,
    )


def escape_regexp(s: str) -> str:
    """Regex-metacharacter escaping (SURVEY.md O16; reference
    ``src/util/escapeRegExp.func.js:1`` — unused in its main flow, kept for
    API completeness). Escapes exactly the reference's character class
    ``.*+?^${}()|[]\\`` — unlike ``re.escape``, which also escapes other
    punctuation and would diverge byte-wise."""
    out = []
    for ch in s:
        if ch in ".*+?^${}()|[]\\":
            out.append("\\")
        out.append(ch)
    return "".join(out)

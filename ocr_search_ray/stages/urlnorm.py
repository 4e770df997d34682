"""URL canonicalization + canonical-URL dedup.

Crawl corpora carry the same page under many spellings (scheme/host case,
default ports, fragments). ``canonical_urls`` applies a fixed, documented
rule set — deliberately expressed in plain string splits so an oracle can
replay it verbatim (no urllib, whose edge behavior is not SQL-portable):

1. drop the fragment (everything from the first ``#``);
2. scheme = lowercase(text before the first ``://``);
3. hostport = text after ``://`` up to the first ``/``; path = the rest;
4. host = lowercase(hostport before ``:``); port = after ``:``;
5. drop the port when empty or default for the scheme (http:80, https:443);
6. empty path becomes ``/``.

``canonical_dedup`` groups by the canonical form and keeps the minimum id
(one exchange via ``cluster_apply``; the per-batch map is pure).

Scale: canonicalization is a stateless per-batch map; dedup is one int-key
exchange on the canonical string — same contract as ``exact_dedup``.
"""

from __future__ import annotations

import pyarrow as pa

from .relational import cluster_apply


def canonicalize(url: str) -> str:
    nofrag = url.split("#", 1)[0]
    if "://" in nofrag:
        scheme, rest = nofrag.split("://", 1)
    else:
        scheme, rest = nofrag, ""
    scheme = scheme.lower()
    hostport = rest.split("/", 1)[0]
    path = rest[len(hostport):]
    if ":" in hostport:
        host, port = hostport.split(":", 1)
    else:
        host, port = hostport, ""
    host = host.lower()
    if port == "" or (scheme == "http" and port == "80") or (
            scheme == "https" and port == "443"):
        portpart = ""
    else:
        portpart = ":" + port
    return f"{scheme}://{host}{portpart}{path if path else '/'}"


def canonical_urls(ds, *, url_col: str = "url"):
    """Append ``canonical_url`` (stateless per-batch map)."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        return batch.append_column(
            "canonical_url",
            pa.array([canonicalize(u or "") for u in urls], pa.string()),
        )

    return ds.map_batches(f, batch_format="pyarrow")


def canonical_dedup(ds, *, url_col: str = "url", id_col: str = "doc_id"):
    """→ (canonical_url, rep_id, n_variants): one row per canonical form,
    representative = min id."""
    withc = canonical_urls(
        ds.select_columns([id_col, url_col]), url_col=url_col
    )

    def partial(batch: pa.Table) -> pa.Table:
        sub = pa.table(
            {
                "canonical_url": batch.column("canonical_url"),
                id_col: batch.column(id_col),
                "one": pa.repeat(pa.scalar(1, pa.int64()), batch.num_rows),
            }
        )
        agg = sub.group_by(["canonical_url"]).aggregate(
            [(id_col, "min"), ("one", "sum")]
        )
        return agg.rename_columns(["canonical_url", "rep_id", "n_part"])

    partials = withc.map_batches(partial, batch_format="pyarrow")

    def block_merge(block: pa.Table) -> pa.Table:
        agg = block.group_by(["canonical_url"]).aggregate(
            [("rep_id", "min"), ("n_part", "sum")]
        )
        return agg.rename_columns(["canonical_url", "rep_id", "n_variants"])

    return cluster_apply(partials, ["canonical_url"], block_merge)

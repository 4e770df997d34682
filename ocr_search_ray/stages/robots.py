"""Robots-rules filtering (crawl compliance) over a URL table.

Applies per-domain allow/disallow path-prefix rules to every url — the
Robots Exclusion Protocol's longest-match semantics (RFC 9309 §2.2.2:
the most specific — longest — matching rule wins; on a length tie the
least restrictive, i.e. allow, wins; no match → allowed).

Rules arrive as a DATASET (domain, rule_type, path_prefix) — at web scale
there is one rule set per registered domain, which is itself corpus-sized,
so no broadcast: ONE int-key exchange on domain co-locates every url with
its domain's rules (tag + union + ``cluster_apply``, the
``cluster_join``-style plan), and a block-local pass evaluates the
longest-match decision per url. Driver state is O(1).
"""

from __future__ import annotations

import pyarrow as pa

from .relational import cluster_apply

_SIDE = "__robots_side"


def split_url(url: str) -> tuple[str, str]:
    """(domain, path) — same derivation as ``textstats.domain_stats``
    (host = text between '://' and the next '/'; path = the rest or '/')."""
    rest = url.split("://", 1)[1] if "://" in url else url
    host = rest.split("/", 1)[0]
    path = rest[len(host):]
    return host, path if path else "/"


def robots_filter(urls, rules, *, url_col: str = "url",
                  domain_col: str = "domain",
                  type_col: str = "rule_type",
                  prefix_col: str = "path_prefix"):
    """→ (url, domain, matched_prefix, fetchable) for every input url.

    ``rules`` rows: (domain, rule_type ∈ {'allow','disallow'},
    path_prefix). Unknown domains and unmatched paths are fetchable
    (REP default-allow).
    """

    def tag_urls(batch: pa.Table) -> pa.Table:
        us = batch.column(url_col).to_pylist()
        doms, paths = [], []
        for u in us:
            d, p = split_url(u or "")
            doms.append(d)
            paths.append(p)
        n = batch.num_rows
        return pa.table(
            {
                "domain": pa.array(doms, pa.string()),
                "url": pa.array(us, pa.string()),
                "path": pa.array(paths, pa.string()),
                "rule_type": pa.nulls(n, pa.string()),
                "path_prefix": pa.nulls(n, pa.string()),
                _SIDE: pa.repeat(pa.scalar(0, pa.int8()), n),
            }
        )

    def tag_rules(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "domain": batch.column(domain_col).cast(pa.string()),
                "url": pa.nulls(n, pa.string()),
                "path": pa.nulls(n, pa.string()),
                "rule_type": batch.column(type_col).cast(pa.string()),
                "path_prefix": batch.column(prefix_col).cast(pa.string()),
                _SIDE: pa.repeat(pa.scalar(1, pa.int8()), n),
            }
        )

    unioned = urls.map_batches(tag_urls, batch_format="pyarrow").union(
        rules.map_batches(tag_rules, batch_format="pyarrow")
    )

    def block_apply(block: pa.Table) -> pa.Table:
        doms = block.column("domain").to_pylist()
        sides = block.column(_SIDE).to_pylist()
        urls_l = block.column("url").to_pylist()
        paths = block.column("path").to_pylist()
        types = block.column("rule_type").to_pylist()
        prefixes = block.column("path_prefix").to_pylist()

        rules_by_dom: dict[str, list[tuple[str, str]]] = {}
        for i in range(block.num_rows):
            if sides[i] == 1:
                rules_by_dom.setdefault(doms[i], []).append(
                    (prefixes[i], types[i])
                )
        # longest prefix first; on equal length allow < disallow
        for lst in rules_by_dom.values():
            lst.sort(key=lambda r: (-len(r[0]), r[1]))

        out_url, out_dom, out_pref, out_ok = [], [], [], []
        for i in range(block.num_rows):
            if sides[i] != 0:
                continue
            matched, ok = "", True
            for prefix, rtype in rules_by_dom.get(doms[i], ()):
                if paths[i].startswith(prefix):
                    matched, ok = prefix, rtype == "allow"
                    break
            out_url.append(urls_l[i])
            out_dom.append(doms[i])
            out_pref.append(matched)
            out_ok.append(ok)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "domain": pa.array(out_dom, pa.string()),
                "matched_prefix": pa.array(out_pref, pa.string()),
                "fetchable": pa.array(out_ok, pa.bool_()),
            }
        )

    return cluster_apply(unioned, ["domain"], block_apply)

"""Link-graph extraction over HTML pages (outlinks, anchors, degrees).

The web-graph side of a crawl pipeline: every page fans out to its
``(src, link_idx, href, anchor_text)`` edges, and a degree aggregation
summarizes the graph per target (total links + distinct linking sources —
the raw ingredients of crawl frontier scoring / PageRank seeding).

Scale shape:

- edge extraction is a pure per-batch DOM pass (html payload consumed
  in-stage, only edge strings leave — same payload-drop discipline as
  ``stages.extract``);
- ``link_degrees`` pre-collapses per batch to one row per (href, src)
  WITH a partial count (the Zipf-head href — a footer link on every page
  — ships one row per batch-distinct source, not one per occurrence),
  then runs ONE int-key exchange on href; block-local Arrow group_by
  computes total and distinct-source counts exactly (collision-safe,
  cluster_apply contract).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

from .relational import cluster_apply


class _LinkParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._text: list[str] = []

    def _flush(self) -> None:
        self.links.append((self._href or "", "".join(self._text)))
        self._href = None
        self._text = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            if self._href is not None:
                self._flush()  # implicit close (nested <a> is invalid HTML)
            self._href = dict(attrs).get("href") or ""
            self._text = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._href is not None:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._text.append(data)


def page_links(html_bytes: bytes) -> list[tuple[str, str]]:
    """→ [(href, anchor_text), ...] in document order; [] on parse error."""
    try:
        parser = _LinkParser()
        parser.feed(html_bytes.decode("utf-8"))
        parser.close()
        if parser._href is not None:  # unclosed trailing anchor
            parser._flush()
        return parser.links
    except Exception:
        return []


def extract_links(pages, *, id_col: str = "doc_id",
                  html_col: str = "html"):
    """→ (src, link_idx, href, anchor_text): one row per outlink."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        src, idxs, hrefs, anchors = [], [], [], []
        for i, html in zip(ids, htmls):
            raw = html if isinstance(html, bytes) else (html or "").encode()
            for j, (href, text) in enumerate(page_links(raw)):
                src.append(i)
                idxs.append(j)
                hrefs.append(href)
                anchors.append(text)
        return pa.table(
            {
                "src": pa.array(src, batch.column(id_col).type),
                "link_idx": pa.array(idxs, pa.int64()),
                "href": pa.array(hrefs, pa.string()),
                "anchor_text": pa.array(anchors, pa.string()),
            }
        )

    return pages.select_columns([id_col, html_col]).map_batches(
        f, batch_format="pyarrow"
    )


def link_degrees(edges, *, href_col: str = "href", src_col: str = "src"):
    """→ (href, n_links, n_srcs): total edge count and distinct linking
    sources per target."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        sub = pa.table(
            {
                href_col: batch.column(href_col),
                src_col: batch.column(src_col),
                "one": pa.repeat(pa.scalar(1, pa.int64()), batch.num_rows),
            }
        )
        agg = sub.group_by([href_col, src_col]).aggregate([("one", "sum")])
        return agg.rename_columns([href_col, src_col, "c_part"])

    partials = edges.map_batches(partial, batch_format="pyarrow")

    def block_merge(block: pa.Table) -> pa.Table:
        # re-merge (href, src) first: a source's edges may span input
        # batches (one partial row each), which must not double-count
        # toward n_srcs
        merged = block.group_by([href_col, src_col]).aggregate(
            [("c_part", "sum")]
        )
        per_src = pa.table(
            {
                href_col: merged.column(href_col),
                src_col: merged.column(src_col),
                "c_part": merged.column("c_part_sum"),
            }
        )
        agg = per_src.group_by([href_col]).aggregate(
            [("c_part", "sum"), (src_col, "count_distinct")]
        )
        return pa.table(
            {
                href_col: agg.column(href_col),
                "n_links": agg.column("c_part_sum").cast(pa.int64()),
                "n_srcs": pc.cast(
                    agg.column(f"{src_col}_count_distinct"), pa.int64()
                ),
            }
        )

    return cluster_apply(partials, [href_col], block_merge)


def top_anchor_texts(edges, k: int = 3, *, href_col: str = "href",
                     anchor_col: str = "anchor_text"):
    """→ (href, anchor_text, n_anchor): the k most frequent anchor texts
    per link target (ties → anchor_text ascending).

    The classic anchor-text signal: inbound anchors label a URL better
    than its own page does (search-engine ranking, LLM URL/topic
    labeling). SQL analogue: ``row_number() OVER (PARTITION BY href
    ORDER BY n DESC, anchor_text) <= k`` over (href, anchor) counts.

    Scale shape: per-batch Arrow group_by partials collapse the Zipf head
    — a site-wide footer anchor ships ONE row per map block, not one per
    edge — then ONE int-key exchange on href; the block walk re-merges
    partial counts exactly (cluster_apply contract: a key's rows never
    split) and keeps k rows per target via the shared head-of-run scan.
    """
    import pyarrow.compute as pc

    from .relational import block_head_per_run

    def partial(batch: pa.Table) -> pa.Table:
        sub = pa.table(
            {
                href_col: batch.column(href_col),
                anchor_col: batch.column(anchor_col),
                "one": pa.repeat(pa.scalar(1, pa.int64()), batch.num_rows),
            }
        )
        agg = sub.group_by([href_col, anchor_col]).aggregate([("one", "sum")])
        return agg.rename_columns([href_col, anchor_col, "c_part"])

    partials = edges.map_batches(partial, batch_format="pyarrow")

    def block_fn(block: pa.Table) -> pa.Table:
        merged = block.group_by([href_col, anchor_col]).aggregate(
            [("c_part", "sum")]
        )
        counts = pa.table(
            {
                href_col: merged.column(href_col),
                anchor_col: merged.column(anchor_col),
                "n_anchor": pc.cast(merged.column("c_part_sum"), pa.int64()),
            }
        )
        return block_head_per_run(
            counts, [href_col],
            [("n_anchor", "descending"), (anchor_col, "ascending")], k)

    return cluster_apply(partials, [href_col], block_fn)


def crawl_frontier(edges, crawled, *, k: int = 100,
                   href_col: str = "href", url_col: str = "url"):
    """→ (href, n_links, n_srcs): the top-k UNCRAWLED link targets under
    (n_srcs desc, n_links desc, href asc) — frontier prioritization, the
    scheduling step of a crawler (fetch next the pages the most distinct
    known pages point at; the reference crawls a fixed tree, this is the
    beyond-reference web-scale companion).

    Composition of scale-audited parts: ``link_degrees`` (combiner-
    collapsed distinct-source counts), one ANTI ``cluster_join`` against
    the crawled-url set (corpus-sized deny list — never broadcast,
    never driver-resident), and ``topk_rows`` (per-block head + one-block
    reduce — no global sort, driver sees ≤ k rows).
    """
    from .relational import cluster_join, topk_rows

    deg = link_degrees(edges, href_col=href_col)
    uncrawled = cluster_join(
        deg,
        crawled.map_batches(
            lambda b: pa.table({href_col: b.column(url_col)}),
            batch_format="pyarrow",
        ),
        [href_col],
        left_types={href_col: pa.string(), "n_links": pa.int64(),
                    "n_srcs": pa.int64()},
        right_types={},
        how="anti",
    )
    return topk_rows(
        uncrawled,
        [("n_srcs", "descending"), ("n_links", "descending"),
         (href_col, "ascending")],
        k,
    )

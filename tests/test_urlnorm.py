"""URL canonicalization rules and canonical dedup."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.urlnorm import canonical_dedup, canonicalize


def test_canonicalize_rules():
    assert canonicalize("HTTP://Example.COM:80/A/b?q=1#frag") == \
        "http://example.com/A/b?q=1"
    assert canonicalize("https://example.com:443") == "https://example.com/"
    assert canonicalize("https://example.com:8443/x") == \
        "https://example.com:8443/x"
    assert canonicalize("http://example.com:443/x") == \
        "http://example.com:443/x"  # non-default for http stays
    assert canonicalize("ftp://Host/") == "ftp://host/"
    assert canonicalize("no-scheme#f") == "no-scheme:///"
    assert canonicalize("") == ":///"


def test_canonical_dedup_groups_variants():
    urls = [
        "https://a.org/x",
        "HTTPS://A.ORG:443/x#top",
        "https://a.org/y",
    ]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([5, 3, 9], pa.int64()),
             "url": pa.array(urls)}
        )
    ).repartition(2)
    got = {
        r["canonical_url"]: (r["rep_id"], r["n_variants"])
        for r in canonical_dedup(ds).take_all()
    }
    assert got == {"https://a.org/x": (3, 2), "https://a.org/y": (9, 1)}

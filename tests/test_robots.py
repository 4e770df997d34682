"""REP longest-match semantics: specificity, allow-on-tie, default allow."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.robots import robots_filter, split_url


def test_split_url():
    assert split_url("https://a.com/x/y") == ("a.com", "/x/y")
    assert split_url("https://a.com") == ("a.com", "/")
    assert split_url("bare") == ("bare", "/")


def test_longest_match_allow_tie_and_default():
    urls = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "https://a.com/private/x",      # disallow /private
                        "https://a.com/private/ok/x",   # allow longer
                        "https://a.com/public",         # no match
                        "https://b.com/tie",            # tie: allow wins
                        "https://nobody.com/anything",  # unknown domain
                    ]
                )
            }
        )
    ).repartition(2)
    rules = rd.from_arrow(
        pa.table(
            {
                "domain": pa.array(
                    ["a.com", "a.com", "b.com", "b.com"]),
                "rule_type": pa.array(
                    ["disallow", "allow", "disallow", "allow"]),
                "path_prefix": pa.array(
                    ["/private", "/private/ok", "/tie", "/tie"]),
            }
        )
    )
    got = {
        r["url"]: (r["matched_prefix"], r["fetchable"])
        for r in robots_filter(urls, rules).take_all()
    }
    assert got == {
        "https://a.com/private/x": ("/private", False),
        "https://a.com/private/ok/x": ("/private/ok", True),
        "https://a.com/public": ("", True),
        "https://b.com/tie": ("/tie", True),
        "https://nobody.com/anything": ("", True),
    }

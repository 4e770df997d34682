"""PII redaction: pattern chain order, multi-match, no-match rows."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.redact import redact_pii


def _run(texts):
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    )
    rows = redact_pii(ds).take_all()
    return {r["doc_id"]: r for r in rows}


def test_redact_multi_and_none():
    got = _run(
        [
            "mail a@b.org and c.d+x@e.co now",
            "plain text with no pii at all",
            "",
        ]
    )
    assert got[0]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert got[0]["n_emails"] == 2
    assert got[1] == {
        "doc_id": 1, "redacted": "plain text with no pii at all",
        "n_emails": 0, "n_ips": 0, "n_phones": 0,
    }
    assert got[2]["redacted"] == ""


def test_redact_chain_order_no_double_count():
    # a numeric host is NOT an e-mail (TLD must be letters) — the IP pass
    # picks it up; a real e-mail's host is consumed by the e-mail pass so
    # the IP pass never sees it; phone digits survive both earlier passes
    got = _run(
        ["u@10.0.0.7 then 192.168.1.1 and +1-555-123-4567 done",
         "u@host10.0.0.7.example.com stays 1.2.3.4"]
    )
    r = got[0]
    assert r["redacted"] == "u@<IP> then <IP> and <PHONE> done"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 2, 1)
    r1 = got[1]
    assert r1["redacted"] == "<EMAIL> stays <IP>"
    assert (r1["n_emails"], r1["n_ips"]) == (1, 1)


def test_redact_custom_patterns():
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["ssn 123-45-6789 x"])})
    )
    rows = redact_pii(
        ds, patterns=[("n_ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>")]
    ).take_all()
    assert rows[0]["redacted"] == "ssn <SSN> x"
    assert rows[0]["n_ssn"] == 1


def test_clean_text_nfc_controls_whitespace():
    from ocr_search_ray.stages.redact import clean_text

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    ["  a\x01b\tc  d \t ", "café ok"]
                ),
            }
        )
    )
    got = {r["doc_id"]: r for r in clean_text(ds).take_all()}
    assert got[0]["text_clean"] == "ab c d"
    assert got[0]["n_chars_raw"] == 13
    assert got[0]["n_chars_clean"] == 6
    # decomposed e + U+0301 composes to one codepoint
    assert got[1]["text_clean"] == "café ok"
    assert got[1]["n_chars_raw"] == 8
    assert got[1]["n_chars_clean"] == 7

"""Id hashing incl. the padding-width edge (SURVEY.md §1.2, §7.5)."""

import hashlib

from ocr_search_ray.functions.hashing import doc_id, file_id, img_path, padded_page


def test_file_id_is_sha256_of_url():
    url = "https://x.example.org/doc-000001"
    assert file_id(url) == hashlib.sha256(url.encode()).hexdigest()


def test_padding_width_follows_page_count():
    # 9-page file pads to 1 digit; 10-page file pads to 2 (PdfUtil.class.js:66-70)
    assert padded_page(3, 9) == "3"
    assert padded_page(3, 10) == "03"
    assert padded_page(3, 100) == "003"
    assert padded_page(10, 10) == "10"


def test_doc_id_changes_when_file_crosses_power_of_ten():
    url = "u"
    assert doc_id(url, 3, 9) == hashlib.sha256(b"u-3").hexdigest()
    assert doc_id(url, 3, 10) == hashlib.sha256(b"u-03").hexdigest()
    assert doc_id(url, 3, 9) != doc_id(url, 3, 10)


def test_img_path_flat_docid_png():
    # post-rearrangement naming (ProcessDirector.class.js:140)
    assert img_path("u", 1, 1) == doc_id("u", 1, 1) + ".png"


def test_escape_regexp_matches_reference_charclass():
    from ocr_search_ray.functions.hashing import escape_regexp

    assert escape_regexp("a.b*c") == r"a\.b\*c"
    assert escape_regexp("(x)|[y]{2}$^?+\\") == \
        r"\(x\)\|\[y\]\{2\}\$\^\?\+\\"
    # chars re.escape would touch but the reference does NOT
    assert escape_regexp("a-b #~") == "a-b #~"
    import re
    for s in ["hello (world)", "a+b*c?", "[set]{1,2}|alt", "back\\slash"]:
        assert re.fullmatch(escape_regexp(s), s)

"""PathConvert — the reference's full path algebra (SURVEY.md O15).

Byte-exact port of the 10 pure conversions at
``reference/src/util/PathConvert.const.js:10-134`` over the directory
layout of ``config/AppConfig.const.js:4-10`` (``data/{pptx,docx,pdf,png}``):
``pptx/docx → pdf → png-dir`` and the inverses. JS ``String.replace`` with
a string pattern replaces the FIRST occurrence only — reproduced here with
``str.replace(..., 1)`` scalar-side and Arrow ``replace_substring(...,
max_replacements=1)`` column-side, and pinned by an adversarial test whose
path contains the directory token twice.

The web data model derives only ``img_path`` from ids
(``functions/hashing.img_path``); this module completes the §2 row for
users running the reference's office-file layout.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_KINDS = ("pptx", "docx", "pdf", "png_dir")


class PathConvert:
    """``convert(path, src, dst)`` plus the 10 JS-named methods.

    ``src``/``dst`` ∈ pptx|docx|pdf|png_dir. Semantics per the reference:
    replace the source directory with the target directory (first
    occurrence), then fix the extension — replace-first for file→file and
    file→dir (dir paths just lose the extension), append for dir→file
    (``PathConvert.const.js:100-133`` template-appends).
    """

    def __init__(self, data_dir: str = "data") -> None:
        self.dirs = {
            "pptx": f"{data_dir}/pptx",
            "docx": f"{data_dir}/docx",
            "pdf": f"{data_dir}/pdf",
            "png_dir": f"{data_dir}/png",
        }
        self.exts = {"pptx": ".pptx", "docx": ".docx", "pdf": ".pdf",
                     "png_dir": ""}

    def convert(self, path: str, src: str, dst: str) -> str:
        if src not in _KINDS or dst not in _KINDS or src == dst:
            raise ValueError(f"bad conversion {src!r} -> {dst!r}")
        out = path.replace(self.dirs[src], self.dirs[dst], 1)
        if self.exts[src]:
            out = out.replace(self.exts[src], self.exts[dst], 1)
        else:
            out = out + self.exts[dst]
        return out

    def convert_column(self, col, src: str, dst: str):
        """Vectorized ``convert`` over an Arrow string array/chunked array."""
        if src not in _KINDS or dst not in _KINDS or src == dst:
            raise ValueError(f"bad conversion {src!r} -> {dst!r}")
        out = pc.replace_substring(
            col, pattern=self.dirs[src], replacement=self.dirs[dst],
            max_replacements=1,
        )
        if self.exts[src]:
            out = pc.replace_substring(
                out, pattern=self.exts[src], replacement=self.exts[dst],
                max_replacements=1,
            )
        elif self.exts[dst]:
            n = len(out)
            out = pc.binary_join_element_wise(
                out, pa.array([self.exts[dst]] * n, pa.string()), ""
            )
        return out

    # the reference's named surface (PathConvert.pptx.toPdf etc.)
    def pptx_to_pdf(self, p: str) -> str:
        return self.convert(p, "pptx", "pdf")

    def pptx_to_png_dir(self, p: str) -> str:
        return self.convert(p, "pptx", "png_dir")

    def docx_to_pdf(self, p: str) -> str:
        return self.convert(p, "docx", "pdf")

    def docx_to_png_dir(self, p: str) -> str:
        return self.convert(p, "docx", "png_dir")

    def pdf_to_pptx(self, p: str) -> str:
        return self.convert(p, "pdf", "pptx")

    def pdf_to_docx(self, p: str) -> str:
        return self.convert(p, "pdf", "docx")

    def pdf_to_png_dir(self, p: str) -> str:
        return self.convert(p, "pdf", "png_dir")

    def png_dir_to_pptx(self, p: str) -> str:
        return self.convert(p, "png_dir", "pptx")

    def png_dir_to_docx(self, p: str) -> str:
        return self.convert(p, "png_dir", "docx")

    def png_dir_to_pdf(self, p: str) -> str:
        return self.convert(p, "png_dir", "pdf")

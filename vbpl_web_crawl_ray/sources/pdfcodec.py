"""Pluggable binary-document codecs — the decode seam where the reference
plugs pdfplumber / Aspose.Words (app/service/anle.py:205-215, get_pdf.py).

This container ships no PDF libraries, so the REAL codec is an honest
``NotImplementedError`` stub documenting its contract, and the
deterministic SIMPDF codec exercises the full plumbing around the seam
(bytes -> text -> watermark strip -> section parse) with real code. A
production deployment registers its codec in ``PDF_CODECS`` (or passes a
callable straight to ParseStage) without touching any pipeline code.
"""

from __future__ import annotations

SIMPDF_MAGIC = b"%SIMPDF%"


def decode_simpdf(data: bytes) -> str:
    """Deterministic fake container: magic header + UTF-8 page text."""
    if not data.startswith(SIMPDF_MAGIC):
        raise ValueError("not a SIMPDF container")
    return data[len(SIMPDF_MAGIC):].decode()


def decode_pdf_binary(data: bytes) -> str:
    """Real-PDF text extraction stub. Contract: full page text with one
    line per text row, page breaks as blank lines — what pdfplumber's
    ``page.extract_text()`` yields (reference anle.py:205-215)."""
    raise NotImplementedError(
        "real PDF decoding needs pdfplumber/Aspose, absent from this "
        "container; register a codec in PDF_CODECS or pass one to "
        "ParseStage(pdf_codec=...)")


SIMDOC_MAGIC = b"%SIMDOC%"


def transcode_simdoc(data: bytes) -> bytes:
    """DOC->PDF transcode seam (reference anle.py:205-210: ``is_pdf``
    check then ``aw.Document(path).save('temp.pdf')``). The sim transcode
    re-containers the text as SIMPDF and injects the Aspose evaluation
    watermark — exactly the artifact the reference strips afterwards
    (anle.py:221-223)."""
    if not data.startswith(SIMDOC_MAGIC):
        raise ValueError("not a SIMDOC container")
    from ..stages.fulltext import ASPOSE_WATERMARK
    return (SIMPDF_MAGIC + ASPOSE_WATERMARK.encode()
            + data[len(SIMDOC_MAGIC):])


def decode_document(data: bytes) -> str:
    """Magic-dispatched decode: non-PDF containers are transcoded to PDF
    first, then text-extracted — the reference's ``process_anle`` flow
    (anle.py:198-215)."""
    if data.startswith(SIMDOC_MAGIC):
        data = transcode_simdoc(data)
    return decode_simpdf(data)


PDF_CODECS = {"simpdf": decode_simpdf, "binary": decode_pdf_binary,
              "document": decode_document}

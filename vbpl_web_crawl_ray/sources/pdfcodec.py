"""Pluggable binary-document codecs — the decode seam where the reference
plugs pdfplumber / Aspose.Words (app/service/anle.py:205-215, get_pdf.py).

Dispatch is by magic bytes: real ``%PDF`` containers go to pdfplumber
when it is importable (it is not baked into this container — the import
is attempted once at module load), the deterministic SIMPDF/SIMDOC
containers always take the hermetic sim path, so the full plumbing
(bytes -> text -> watermark strip -> section parse) is exercised with
real code in every environment. A production deployment can also
register its codec in ``PDF_CODECS`` (or pass a callable straight to
ParseStage) without touching any pipeline code.
"""

from __future__ import annotations

try:  # optional: real PDF text extraction when the library exists
    import pdfplumber as _pdfplumber  # type: ignore
except ImportError:  # hermetic container path
    _pdfplumber = None

HAVE_PDFPLUMBER = _pdfplumber is not None

SIMPDF_MAGIC = b"%SIMPDF%"
PDF_MAGIC = b"%PDF"           # real PDF container
OLE_MAGIC = b"\xd0\xcf\x11\xe0"  # legacy .doc (OLE2) container


def decode_simpdf(data: bytes) -> str:
    """Deterministic fake container: magic header + UTF-8 page text."""
    if not data.startswith(SIMPDF_MAGIC):
        raise ValueError("not a SIMPDF container")
    return data[len(SIMPDF_MAGIC):].decode()


def decode_pdf_binary(data: bytes) -> str:
    """Real-PDF text extraction. Contract: full page text with one line
    per text row, page breaks as blank lines — what pdfplumber's
    ``page.extract_text()`` yields (reference anle.py:205-215). Uses
    pdfplumber when importable; otherwise an honest stub."""
    if _pdfplumber is not None:
        import io
        with _pdfplumber.open(io.BytesIO(data)) as pdf:
            return "\n\n".join((page.extract_text() or "")
                               for page in pdf.pages)
    raise NotImplementedError(
        "real PDF decoding needs pdfplumber/Aspose, absent from this "
        "container; register a codec in PDF_CODECS or pass one to "
        "ParseStage(pdf_codec=...)")


SIMDOC_MAGIC = b"%SIMDOC%"


def _find_soffice() -> str | None:
    """LibreOffice binary, if this host has one (never in this
    container; real deployments commonly do)."""
    import shutil
    for name in ("soffice", "libreoffice"):
        p = shutil.which(name)
        if p:
            return p
    return None


HAVE_SOFFICE = _find_soffice() is not None


def transcode_doc_via_soffice(data: bytes,
                              timeout: float = 120.0) -> bytes:
    """Legacy OLE2 ``.doc`` -> PDF via a LibreOffice subprocess
    (``soffice --headless --convert-to pdf``) — the open-source
    counterpart of the reference's Aspose.Words transcode
    (app/service/anle.py:205-210: ``aw.Document(path).save('temp.pdf')``).

    Subprocess, not in-process: no OSS library converts OLE2 Word
    binaries in-process, and a crashed converter must not take the Ray
    worker down. One tempdir per call keeps parallel actor-pool workers
    isolated. Raises NotImplementedError when no soffice binary exists
    (this container), so the dispatch in :func:`decode_document` keeps
    its honest-seam contract."""
    exe = _find_soffice()
    if exe is None:
        raise NotImplementedError(
            "legacy .doc transcode needs a converter: no LibreOffice "
            "(soffice) on PATH and no in-process OSS equivalent of "
            "Aspose.Words exists; install libreoffice or register a "
            "transcoder in PDF_CODECS")
    import os
    import subprocess
    import tempfile
    with tempfile.TemporaryDirectory(prefix="docx2pdf_") as td:
        src = os.path.join(td, "in.doc")
        with open(src, "wb") as f:
            f.write(data)
        subprocess.run(
            [exe, "--headless", "--norestore", "--convert-to", "pdf",
             "--outdir", td, src],
            check=True, capture_output=True, timeout=timeout)
        out = os.path.join(td, "in.pdf")
        if not os.path.exists(out):
            raise RuntimeError("soffice produced no PDF output")
        with open(out, "rb") as f:
            return f.read()


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
    (anle.py:198-215). Real ``%PDF`` bytes route to pdfplumber when
    available; SIMDOC/SIMPDF always take the hermetic sim path; legacy
    OLE2 ``.doc`` needs a DOC->PDF transcoder (Aspose in the reference),
    which has no open-source in-process equivalent here."""
    if data.startswith(SIMDOC_MAGIC):
        data = transcode_simdoc(data)
    if data.startswith(PDF_MAGIC):
        return decode_pdf_binary(data)
    if data.startswith(OLE_MAGIC):
        # DOC -> PDF -> text, like SIMDOC but through the subprocess
        # seam; raises NotImplementedError when no converter exists
        return decode_pdf_binary(transcode_doc_via_soffice(data))
    return decode_simpdf(data)


PDF_CODECS = {"simpdf": decode_simpdf, "binary": decode_pdf_binary,
              "document": decode_document}

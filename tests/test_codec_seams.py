"""Opportunistic real-codec seams (VERDICT r3 fix #4).

Magic-byte dispatch picks the decode path: sim containers always take the
hermetic path (works in every environment), real PDF/PNG/JPEG bytes route
to pdfplumber/Pillow when importable, honest NotImplementedError when not.
Both branches are covered: the sim assertions always run; the real-library
assertions run only where the library exists (skip-if-absent), matching
the reference behaviors at app/service/anle.py:205-215.
"""

import numpy as np
import pytest

from vbpl_web_crawl_ray.sources import imaging
from vbpl_web_crawl_ray.sources import pdfcodec


# ---------------------------------------------------------------- pdf ----

def test_sim_paths_always_hermetic():
    data = pdfcodec.SIMPDF_MAGIC + "trang 1\n\ntrang 2".encode()
    assert pdfcodec.decode_document(data) == "trang 1\n\ntrang 2"
    doc = pdfcodec.SIMDOC_MAGIC + "noi dung".encode()
    out = pdfcodec.decode_document(doc)
    assert "noi dung" in out  # transcode injects the watermark, keeps text


def test_ole_doc_needs_transcoder():
    if pdfcodec.HAVE_SOFFICE:
        pytest.skip("soffice present: the honest-seam branch unreachable")
    with pytest.raises(NotImplementedError, match="soffice|LibreOffice"):
        pdfcodec.decode_document(pdfcodec.OLE_MAGIC + b"legacy doc body")


def test_ole_doc_soffice_subprocess_seam(monkeypatch, tmp_path):
    """The OLE2 branch drives the LibreOffice subprocess contract
    end-to-end with a faked converter: the .doc bytes land in the
    tempdir as in.doc, soffice is invoked headless with --convert-to
    pdf, and the produced in.pdf bytes come back verbatim."""
    calls = {}

    def fake_run(cmd, check, capture_output, timeout):
        calls["cmd"] = cmd
        outdir = cmd[cmd.index("--outdir") + 1]
        src = cmd[-1]
        with open(src, "rb") as f:
            assert f.read().startswith(pdfcodec.OLE_MAGIC)
        with open(f"{outdir}/in.pdf", "wb") as f:
            f.write(b"%PDF-1.4 converted")
        return None

    monkeypatch.setattr(pdfcodec, "_find_soffice", lambda: "/usr/bin/soffice")
    import subprocess
    monkeypatch.setattr(subprocess, "run", fake_run)
    out = pdfcodec.transcode_doc_via_soffice(
        pdfcodec.OLE_MAGIC + b"legacy body")
    assert out == b"%PDF-1.4 converted"
    assert calls["cmd"][0] == "/usr/bin/soffice"
    assert "--headless" in calls["cmd"] and "pdf" in calls["cmd"]


@pytest.mark.skipif(not pdfcodec.HAVE_SOFFICE,
                    reason="LibreOffice absent from this container")
def test_ole_doc_real_soffice_branch():
    # LibreOffice opens text content under a .doc name; the seam must
    # return real %PDF bytes
    out = pdfcodec.transcode_doc_via_soffice(b"plain text body")
    assert out.startswith(b"%PDF")


@pytest.mark.skipif(pdfcodec.HAVE_PDFPLUMBER,
                    reason="pdfplumber present: stub branch unreachable")
def test_real_pdf_without_library_is_honest():
    with pytest.raises(NotImplementedError, match="pdfplumber"):
        pdfcodec.decode_document(b"%PDF-1.7\nreal pdf body")


@pytest.mark.skipif(not pdfcodec.HAVE_PDFPLUMBER,
                    reason="pdfplumber absent from this container")
def test_real_pdf_decodes_via_pdfplumber(tmp_path):
    # build a minimal single-page PDF with a text object, then round-trip
    # through the magic-dispatched seam
    content = (b"BT /F1 12 Tf 72 712 Td (Hello seam) Tj ET")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    pdf = b"%PDF-1.4\n"
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(pdf))
        pdf += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(pdf)
    pdf += f"xref\n0 {len(objs)+1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        pdf += f"{off:010d} 00000 n \n".encode()
    pdf += (f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    assert "Hello seam" in pdfcodec.decode_document(pdf)


# -------------------------------------------------------------- images ---

def test_sim_image_magic_still_decodes():
    px = imaging.gen_pixels("img42", 32, 24)
    assert np.array_equal(imaging.decode_image(imaging.encode_image(px, "png")), px)


@pytest.mark.skipif(imaging.HAVE_PIL,
                    reason="Pillow present: stub branch unreachable")
def test_real_image_without_library_is_honest():
    with pytest.raises(NotImplementedError, match="Pillow"):
        imaging.decode_image(imaging.REAL_PNG_MAGIC + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="Pillow"):
        imaging.decode_image(imaging.REAL_JPG_MAGIC + b"\x00" * 16)


@pytest.mark.skipif(not imaging.HAVE_PIL,
                    reason="Pillow absent from this container")
def test_real_png_decodes_via_pillow():
    import io
    from PIL import Image
    px = imaging.gen_pixels("img42", 32, 24)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    got = imaging.decode_image(buf.getvalue())
    assert np.array_equal(got, px)  # PNG is lossless; luminance unchanged


def test_unknown_magic_still_honest():
    with pytest.raises(NotImplementedError, match="unknown image magic"):
        imaging.decode_image(b"GIF89a\x00\x00")

"""Full-text hierarchy parsing — the reference's flagship transform (M5-M7)
and the PDF sectioner (M12), re-expressed as per-document flat-maps.

Semantics reproduce the reference exactly (file:line cites below), with
lines-as-strings instead of BeautifulSoup nodes: ``find_next_sibling('p')``
becomes index+1 over the document's line list. Rows are independent across
documents and strictly ordered within one, so the batch entry point keeps
one whole document per cell and never splits it across batches
(SURVEY.md §2.2 M6 mapping).

Known reference quirks reproduced on purpose:
- the final line of a document is NOT appended to the last section's
  content (emit-before-append, reference app/service/vbpl.py:355-377);
- hierarchy "name" lines are skipped from section content
  (vbpl.py:350-355);
- reset_part() clears only part/mini-part, never chapter
  (app/entity/vbpl.py:12-16);
- chapter/part numbers take the WHOLE rest of the line after the keyword
  ('(?<=Chương ).+', vbpl.py:269).

One divergence: a big-part line like 'Phần hai' (without 'thứ') crashes
the reference ('(?<=Phần thứ ).+' returns None, vbpl.py:260-261); here it
falls back to the text after 'Phần '.
"""

from __future__ import annotations

import copy
import re
from dataclasses import dataclass

import pandas as pd
import ray.data as rd

# regexes: reference app/service/vbpl.py:36-43
BIG_PART_RE = re.compile(
    r"^((Phần)|(Phần thứ)) (nhất|hai|ba|bốn|năm|sáu|bảy|tám|chín|mười)$")
SECTION_RE = re.compile(r"^((Điều)|(Điều thứ)) \d+")
CHAPTER_RE = re.compile(r"^Chương [IVX]+")
PART_RE = re.compile(r"^Mục [IVX]+")
PART_OCR_RE = re.compile(r"^Mu.c [IVX]+")     # OCR-damaged variant
MINI_PART_RE = re.compile(r"^Tiểu mục [IVX]+")
START_SUB_PART_RE = re.compile(r"^PHỤ LỤC$")
SEPARATOR_RE = re.compile(r"_{2,}")

NAME_DEMOTION_LEN = 400  # reference vbpl.py:334-336


@dataclass
class FullTextState:
    """Parser hierarchy state (reference VbplFullTextField,
    app/entity/vbpl.py:1-22)."""
    big_part_number: str | None = None
    big_part_name: str | None = None
    chapter_number: str | None = None
    chapter_name: str | None = None
    part_number: str | None = None
    part_name: str | None = None
    mini_part_number: str | None = None
    mini_part_name: str | None = None

    def reset_part(self) -> None:
        self.part_number = None
        self.part_name = None
        self.mini_part_number = None
        self.mini_part_name = None


def _next_line(lines: list[str], i: int) -> str | None:
    return lines[i + 1].strip() if i + 1 < len(lines) else None


def update_hierarchy(lines: list[str], i: int,
                     state: FullTextState) -> bool:
    """Reference update_vbpl_phapquy_fulltext (vbpl.py:254-291): returns
    True if line i is a hierarchy header (state mutated in place)."""
    text = lines[i].strip()
    check = False
    if BIG_PART_RE.search(text):
        m = re.search(r"(?<=Phần thứ ).+", text)
        if m:
            state.big_part_number = text[m.span()[0]:]
        else:  # divergence: reference crashes on 'Phần hai'
            state.big_part_number = text.split("Phần ", 1)[-1]
        state.big_part_name = _next_line(lines, i)
        state.reset_part()
        check = True
    if CHAPTER_RE.search(text):
        state.chapter_number = re.findall(r"(?<=Chương ).+", text)[0]
        state.chapter_name = _next_line(lines, i)
        state.reset_part()
        check = True
    if PART_RE.search(text) or PART_OCR_RE.search(text):
        if PART_RE.search(text):
            state.part_number = re.findall(r"(?<=Mục ).+", text)[0]
        else:
            state.part_number = re.findall(r"(?<=Mu.c ).+", text)[0]
        state.part_name = _next_line(lines, i)
        check = True
    if MINI_PART_RE.search(text):
        state.mini_part_number = re.findall(r"(?<=Tiểu mục ).+", text)[0]
        state.mini_part_name = _next_line(lines, i)
        check = True
    return check


def parse_sub_parts(doc_id, lines: list[str]) -> list[dict]:
    """Appendix parser (reference process_vbpl_sub_part, vbpl.py:380-437).
    ``lines[0]`` is the 'PHỤ LỤC' marker line; lines[1] the title."""
    title = lines[1].strip() if len(lines) > 1 else None
    regex_dict = {
        r"^Phụ(\s)*(\n)*lục [IVX]+": r"(?<=lục )[IVX]+",
        r"^Phụ(\s)*(\n)*lục \d+": r"(?<=lục )\d+",
    }
    out: list[dict] = []
    title_is_next = False
    for i in range(2, len(lines)):
        if title_is_next:
            title_is_next = False
            continue
        text = lines[i].strip()
        for check_re, extract_re in regex_dict.items():
            if re.search(check_re, text):
                m = re.search(extract_re, text)
                number = text[m.span()[0]:m.span()[1]]
                if not re.search(r"^[IVX]+$", number) \
                        and not re.search(r"^\d+$", number):
                    continue
                part_title = text[m.span()[1]:].strip()
                if part_title == "":  # title below, not beside
                    part_title = _next_line(lines, i)
                    title_is_next = True
                out.append({"vbpl_id": doc_id, "sub_section_title": title,
                            "sub_section_part_number": number,
                            "sub_section_part_title": part_title})
                break
    if not out:  # default row (vbpl.py:430-436)
        out.append({"vbpl_id": doc_id, "sub_section_title": title,
                    "sub_section_part_number": "0",
                    "sub_section_part_title": None})
    return out


def parse_fulltext(doc_id, lines: list[str]) -> tuple[list[dict], list[dict]]:
    """The flagship per-document state machine (reference
    process_html_full_text, vbpl.py:293-378). Returns (sections, sub_parts).
    """
    state = FullTextState()
    sections: list[dict] = []

    # pass 1: pre-scan hierarchy context until the first section header
    for i, line in enumerate(lines):
        text = line.strip()
        if SECTION_RE.search(text):
            break
        update_hierarchy(lines, i, state)

    # pass 2: per section header, walk forward accumulating content
    for i, line in enumerate(lines):
        text = line.strip()

        if START_SUB_PART_RE.search(text):
            return sections, parse_sub_parts(doc_id, lines[i:])

        if not SECTION_RE.search(text):
            continue
        num_m = re.search(r"\b\d+", text)
        section_number = int(num_m.group())
        raw_name = text[num_m.span()[1]:]
        name = None
        name_m = re.search(r"\b\w", raw_name)
        if name_m:
            name = raw_name[name_m.span()[0]:]

        snapshot = copy.deepcopy(state)
        content: list[str] = []
        if name is not None and len(name) >= NAME_DEMOTION_LEN:
            content.append(name)
            name = None

        j = i
        while True:
            j += 1
            if j >= len(lines):
                break
            node = lines[j].strip()
            if update_hierarchy(lines, j, state):
                j += 1  # skip the hierarchy-name line too (vbpl.py:350-355)
                if j >= len(lines):
                    break
                continue
            if (SECTION_RE.search(node) or SEPARATOR_RE.search(node)
                    or j + 1 >= len(lines) or START_SUB_PART_RE.search(node)):
                sections.append({
                    "vbpl_id": doc_id,
                    "section_number": section_number,
                    "section_name": name,
                    "section_content": "\n".join(content),
                    "chapter_number": snapshot.chapter_number,
                    "chapter_name": snapshot.chapter_name,
                    "part_number": snapshot.part_number,
                    "part_name": snapshot.part_name,
                    "mini_part_number": snapshot.mini_part_number,
                    "mini_part_name": snapshot.mini_part_name,
                    "big_part_number": snapshot.big_part_number,
                    "big_part_name": snapshot.big_part_name,
                })
                break
            content.append(node)
    return sections, None


def parse_fulltext_batch(ds: rd.Dataset, id_col: str = "doc_id",
                         text_col: str = "text") -> rd.Dataset:
    """Per-document flat-map: one input row (whole doc in one cell) ->
    N section rows. Documents never straddle batches — the per-row cell IS
    the ordering boundary (SURVEY.md hard part (c))."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for did, text in zip(df[id_col], df[text_col]):
            secs, _ = parse_fulltext(did, text.split("\n"))
            rows.extend(secs)
        cols = ["vbpl_id", "section_number", "section_name", "section_content",
                "chapter_number", "chapter_name", "part_number", "part_name",
                "mini_part_number", "mini_part_name", "big_part_number",
                "big_part_name"]
        return pd.DataFrame(rows, columns=cols)
    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# PDF sectioner (M12) — reference extract_pdf_content, anle.py:231-257
# ---------------------------------------------------------------------------

ANLE_CONTEXT = "Tình huống án lệ:"
ANLE_SOLUTION = "Giải pháp pháp lý:"
ANLE_CONTENT = "NỘI DUNG ÁN LỆ"
ASPOSE_WATERMARK = ("Created with an evaluation copy of Aspose.Words. "
                    "To discover the full versions of our APIs please visit: "
                    "https://products.aspose.com/words/")


def extract_pdf_section(section: str, text: str) -> str:
    """Line-oriented marker state machine, faithful to the reference
    (enter on marker line; CONTENT mode runs to EOF, others exit on a later
    ':' line; CONTENT post-processing joins, drops the last char and
    re-lines '[' markers)."""
    lines = text.split("\n")
    out: list[str] = []
    inside = False
    for line in lines:
        if section in line:
            if inside:
                continue
            inside = True
        elif inside and section == ANLE_CONTENT:
            out.append(line)
        elif inside and ":" in line:
            inside = False
        else:
            if inside:
                out.append(line)
    if section == ANLE_CONTENT:
        return " ".join(out)[:-1].replace("[", "\n[")
    return " ".join(out)


def sectionize_pdf_batch(ds: rd.Dataset, id_col: str = "doc_id",
                         text_col: str = "text") -> rd.Dataset:
    """Batch form: one row in -> one struct of the three anle sections,
    watermark stripped first (reference anle.py:221-223)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].str.replace(ASPOSE_WATERMARK, "", regex=False)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "context": [extract_pdf_section(ANLE_CONTEXT, t) for t in texts],
            "solution": [extract_pdf_section(ANLE_SOLUTION, t) for t in texts],
            "content": [extract_pdf_section(ANLE_CONTENT, t) for t in texts],
        })
    return ds.map_batches(f, batch_format="pandas")


# filename-embedded identity (reference anle.py:196-204: the file path is
# the ONLY carrier of the doc id — r'\((.*?)\)-' — and of processing order)
ANLE_FILE_ID_RE = re.compile(r"\((.*?)\)-")
ANLE_FILE_SEQ_RE = re.compile(r"-p(\d+)\.")


def reassociate_anle_files(files_ds: rd.Dataset,
                           codec=None) -> rd.Dataset:
    """1-doc -> N-binary-files re-association (reference
    anle.py:107-120,193-215,260-287): each attachment's doc id is parsed
    back OUT OF THE FILENAME, the blob decoded through the pluggable codec
    (non-PDF containers transcode first), watermark stripped, the three
    anle sections extracted, then sections re-keyed per doc keeping the
    LAST file's values — the observable outcome of the reference's
    sequential per-file upsert (to_anle_section_db, anle.py:260-287).

    Distributed shape: one decode+extract map_batches pass (per-blob codec
    work, like the image decode stages), then a tiny (one row per file)
    bucketed argmax by file sequence. The blob column never shuffles —
    only the extracted section rows do."""
    from ..sources.pdfcodec import decode_document
    from .shuffle import bucketed_group_apply
    codec = codec or decode_document

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        ids, seqs, ctx, sol, cont = [], [], [], [], []
        for name, data in zip(df["file_name"], df["data"]):
            m = ANLE_FILE_ID_RE.search(name)
            if m is None:
                continue
            try:
                text = codec(bytes(data))
            except NotImplementedError:
                continue
            text = text.replace(ASPOSE_WATERMARK, "")
            sq = ANLE_FILE_SEQ_RE.search(name)
            ids.append(m.group(1))
            seqs.append(int(sq.group(1)) if sq else 0)
            ctx.append(extract_pdf_section(ANLE_CONTEXT, text))
            sol.append(extract_pdf_section(ANLE_SOLUTION, text))
            cont.append(extract_pdf_section(ANLE_CONTENT, text))
        return pd.DataFrame({"anle_id": pd.array(ids, dtype="string"),
                             "seq": pd.array(seqs, dtype="int64"),
                             "context": pd.array(ctx, dtype="string"),
                             "solution": pd.array(sol, dtype="string"),
                             "content": pd.array(cont, dtype="string")})

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        # per-batch winner per doc (keeps seq for the cross-batch argmax)
        return (g.sort_values("seq")
                 .groupby("anle_id", as_index=False).tail(1))

    def last(g: pd.DataFrame) -> pd.DataFrame:
        return partial(g)[["anle_id", "context", "solution", "content"]]

    per_file = files_ds.map_batches(extract, batch_format="pandas")
    return bucketed_group_apply(per_file, "anle_id", last,
                                partial_fn=partial)

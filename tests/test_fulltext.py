"""Parser-parity tests (FIXTURES.md F7): full-text hierarchy state machine,
appendix parser, PDF sectioner, fuzzy kernels."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vbpl_web_crawl_ray.functions import fuzzy
from vbpl_web_crawl_ray.stages import fulltext as ft


DOC_BASIC = """Phần thứ nhất
QUY ĐỊNH CHUNG
Chương I
NHỮNG QUY ĐỊNH CHUNG
Điều 1. Phạm vi điều chỉnh
Nội dung điều một dòng một.
Nội dung điều một dòng hai.
Điều 2. Đối tượng áp dụng
Nội dung điều hai.
__________
Dòng cuối không thuộc điều nào."""


class TestFullText:
    def test_basic_sections_and_hierarchy(self):
        secs, sub = ft.parse_fulltext(7, DOC_BASIC.split("\n"))
        assert sub is None
        assert [s["section_number"] for s in secs] == [1, 2]
        s1 = secs[0]
        assert s1["vbpl_id"] == 7
        assert s1["section_name"] == "Phạm vi điều chỉnh"
        assert s1["section_content"] == \
            "Nội dung điều một dòng một.\nNội dung điều một dòng hai."
        assert s1["big_part_number"] == "nhất"
        assert s1["big_part_name"] == "QUY ĐỊNH CHUNG"
        assert s1["chapter_number"] == "I"
        assert s1["chapter_name"] == "NHỮNG QUY ĐỊNH CHUNG"
        # section 2 terminated by the '____' separator
        assert secs[1]["section_content"] == "Nội dung điều hai."

    def test_chapter_resets_part_but_not_chapter(self):
        doc = """Chương I
TÊN CHƯƠNG MỘT
Mục I
TÊN MỤC
Tiểu mục I
TÊN TIỂU MỤC
Điều 1. A
nội dung 1
Chương II
TÊN CHƯƠNG HAI
Điều 2. B
nội dung 2
hết
"""
        secs, _ = ft.parse_fulltext(1, doc.split("\n"))
        s1, s2 = secs[0], secs[1]
        assert s1["chapter_number"] == "I" and s1["part_number"] == "I"
        assert s1["mini_part_number"] == "I"
        # reset_part clears part/mini when Chương II appears; chapter updates
        assert s2["chapter_number"] == "II"
        assert s2["part_number"] is None and s2["mini_part_number"] is None

    def test_ocr_damaged_muc_variant(self):
        doc = "Mu.c II\nTÊN MỤC OCR\nĐiều 1. X\nnội dung\nhết\n"
        secs, _ = ft.parse_fulltext(1, doc.split("\n"))
        assert secs[0]["part_number"] == "II"
        assert secs[0]["part_name"] == "TÊN MỤC OCR"

    def test_long_name_demoted_to_content(self):
        long_name = "x" * 450
        doc = f"Điều 1. {long_name}\nthêm nội dung\nhết\n"
        secs, _ = ft.parse_fulltext(1, doc.split("\n"))
        assert secs[0]["section_name"] is None
        assert secs[0]["section_content"].startswith(long_name)

    def test_hierarchy_name_lines_skipped_from_content(self):
        doc = ("Điều 1. A\nnội dung một\nChương II\nTÊN CHƯƠNG\n"
               "nội dung sau chương\nĐiều 2. B\nnội dung hai\nhết\n")
        secs, _ = ft.parse_fulltext(1, doc.split("\n"))
        assert "TÊN CHƯƠNG" not in secs[0]["section_content"]
        assert "nội dung sau chương" in secs[0]["section_content"]
        # hierarchy advanced mid-walk applies to the NEXT section's snapshot
        assert secs[0]["chapter_number"] is None
        assert secs[1]["chapter_number"] == "II"

    def test_appendix_roman_and_decimal(self):
        doc = ("Điều 1. A\nnội dung\nPHỤ LỤC\nDANH MỤC KÈM THEO\n"
               "Phụ lục I MẪU SỐ MỘT\nPhụ lục 2\nMẪU Ở DÒNG DƯỚI\n"
               "Phụ lục nonsense\nhết\n")
        secs, subs = ft.parse_fulltext(9, doc.split("\n"))
        assert len(secs) == 1
        nums = [(s["sub_section_part_number"], s["sub_section_part_title"])
                for s in subs]
        assert ("I", "MẪU SỐ MỘT") in nums          # title beside
        assert ("2", "MẪU Ở DÒNG DƯỚI") in nums     # title below
        assert all(s["sub_section_title"] == "DANH MỤC KÈM THEO" for s in subs)

    def test_appendix_default_row(self):
        doc = "Điều 1. A\nnội dung\nPHỤ LỤC\nTIÊU ĐỀ\nkhông có mục nào\nhết\n"
        _, subs = ft.parse_fulltext(3, doc.split("\n"))
        assert len(subs) == 1
        assert subs[0]["sub_section_part_number"] == "0"
        assert subs[0]["sub_section_part_title"] is None

    def test_batch_flat_map(self):
        ds = rd.from_items([
            {"doc_id": 1, "text": DOC_BASIC},
            {"doc_id": 2, "text": "Điều 1. Z\nnội dung z\nhết\n"},
        ])
        out = ft.parse_fulltext_batch(ds).to_pandas()
        assert set(out["vbpl_id"]) == {1, 2}
        assert len(out[out["vbpl_id"] == 1]) == 2


class TestPdfSectioner:
    TEXT = ("Mở đầu không liên quan\n"
            "Tình huống án lệ:\n"
            "Trong vụ án có tình huống A\n"
            "và tình tiết B\n"
            "Giải pháp pháp lý: cần xử lý C\n"
            "phần tiếp của giải pháp\n"
            "Quy định liên quan: dừng ở đây\n"
            "NỘI DUNG ÁN LỆ\n"
            "[1] Đoạn một nội dung\n"
            "[2] Đoạn hai nội dung.\n")

    def test_context_stops_at_colon_line(self):
        out = ft.extract_pdf_section(ft.ANLE_CONTEXT, self.TEXT)
        assert out == "Trong vụ án có tình huống A và tình tiết B"

    def test_content_runs_to_eof_with_relining(self):
        out = ft.extract_pdf_section(ft.ANLE_CONTENT, self.TEXT)
        assert out.startswith("\n[1]")
        assert "\n[2]" in out
        # trailing-newline input: the reference's [:-1] eats the join space
        assert out.endswith("Đoạn hai nội dung.")

    def test_solution_skips_marker_line_and_stops_at_colon(self):
        out = ft.extract_pdf_section(ft.ANLE_SOLUTION, self.TEXT)
        # content on the marker line itself is NOT captured (reference
        # enters on the marker, collects from the NEXT line)
        assert out == "phần tiếp của giải pháp"

    def test_batch_and_watermark_strip(self):
        ds = rd.from_items([{"doc_id": 5,
                             "text": self.TEXT + ft.ASPOSE_WATERMARK}])
        out = ft.sectionize_pdf_batch(ds).to_pandas()
        assert len(out) == 1
        assert "Aspose" not in out["content"][0]
        assert "giải pháp" in out["solution"][0]


class TestFuzzy:
    def test_levenshtein_known(self):
        assert fuzzy.levenshtein("kitten", "sitting") == 3
        assert fuzzy.levenshtein("", "abc") == 3
        assert fuzzy.levenshtein("abc", "abc") == 0

    def test_ratio_matches_python_levenshtein_semantics(self):
        # Levenshtein.ratio("ab","ac") = (4-2)/4 = 0.5 (sub costs 2)
        assert fuzzy.ratio("ab", "ac") == pytest.approx(0.5)
        assert fuzzy.ratio("abc", "abc") == 1.0
        assert fuzzy.ratio("", "") == 1.0

    def test_similarity(self):
        assert fuzzy.similarity("abcd", "abce") == pytest.approx(0.75)

    def test_threshold_straddle(self):
        # FIXTURES F7: pairs straddling the 0.8 gate
        assert fuzzy.ratio("Nghị định 100/2019", "Nghị định 100/2020") >= 0.8
        assert fuzzy.ratio("Nghị định 100/2019", "Thông tư 55/2005") < 0.8


class TestEnrich:
    def test_fuzzy_lookup_first_match_wins(self):
        from vbpl_web_crawl_ray.stages.enrich import fuzzy_lookup
        cands = [{"name": "Nghị định 15/2020/NĐ-CP", "sector": "CNTT"},
                 {"name": "Nghị định 15/2021/NĐ-CP", "sector": "Khác"}]
        ds = rd.from_items([{"serial": "Nghị định 15/2020/NĐ-CP"},
                            {"serial": "hoàn toàn khác biệt xyz"}])
        out = fuzzy_lookup(ds, "serial", cands, "name",
                           out_cols=["sector"]).to_pandas()
        by = dict(zip(out["serial"], out["sector"]))
        assert by["Nghị định 15/2020/NĐ-CP"] == "CNTT"  # first match wins
        assert by["hoàn toàn khác biệt xyz"] is None

    def test_containment_enrich_coalesce(self):
        from vbpl_web_crawl_ray.stages.enrich import containment_enrich
        cands = [{"title": "Quyết định 99 về đất đai", "sector": "Đất đai"},
                 {"title": "Quyết định 99 sửa đổi", "sector": "Hành chính"}]
        ds = rd.from_items([
            {"serial": "Quyết định 99", "sector_old": None},
            {"serial": "Không khớp gì", "sector_old": None},
            {"serial": "Quyết định 99", "sector_old": "Giao thông"},
        ])
        out = containment_enrich(ds, "serial", "sector_old", cands, "title",
                                 "sector", "Lĩnh vực khác", "sector").to_pandas()
        vals = list(out.sort_index()["sector"])
        assert "Đất đai - Hành chính" in vals      # multi-value ' - ' join
        assert "Lĩnh vực khác" in vals             # default
        assert "Giao thông" in vals                # existing value kept

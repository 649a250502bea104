"""Unit tests for scalar kernels: hashing, canonicalization, text/date utils."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, strategies as st

from vbpl_web_crawl_ray.functions import canon, hashing, text


class TestHashing:
    def test_stable_across_calls(self):
        a = hashing.hash64(["http://x.test/a", "http://x.test/b"])
        b = hashing.hash64(["http://x.test/a", "http://x.test/b"])
        assert (a == b).all()
        assert a[0] != a[1]
        assert a.dtype == np.uint64

    def test_known_stability_pin(self):
        # pin one value so accidental hash-key changes are caught
        v = hashing.hash64_one("stability-pin")
        assert v == hashing.hash64_one("stability-pin")

    def test_mix64_changes_values(self):
        h = hashing.hash64(["a", "b", "c"])
        m = hashing.mix64(h)
        assert (m != h).all()

    def test_fnv1a64(self):
        # canonical FNV-1a test vector
        assert hashing.fnv1a64(b"") == 0xCBF29CE484222325
        assert hashing.fnv1a64(b"a") == 0xAF63DC4C8601EC8C


class TestCanon:
    @pytest.mark.parametrize("raw,expect", [
        ("HTTP://Example.COM:80/a/b", "http://example.com/a/b"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://h.test/a/./b/../c", "http://h.test/a/c"),
        ("http://h.test", "http://h.test/"),
        ("http://h.test/%7euser", "http://h.test/~user"),
        ("http://h.test/a%2Fb", "http://h.test/a/b"),
        ("http://h.test/p?q=1#frag", "http://h.test/p?q=1"),
        ("http://h.test/doc..pdf", "http://h.test/doc.pdf"),
        ("http://h.test/f..docx", "http://h.test/f.docx"),
    ])
    def test_canonicalize(self, raw, expect):
        assert canon.canonicalize_url(raw) == expect

    def test_idempotent(self):
        urls = ["HTTP://A.test:80/x/../y?b=2", "https://b.test/%41"]
        once = canon.canonicalize_urls(urls)
        twice = canon.canonicalize_urls(once)
        assert list(once) == list(twice)

    def test_trap_variants_collapse(self):
        # FIXTURES.md F2: variants of the same resource must hash identically
        variants = ["HTTP://Host1.TEST/p_listing.aspx?Page=3",
                    "http://host1.test:80/p_listing.aspx?Page=3",
                    "http://host1.test/x/../p_listing.aspx?Page=3"]
        hashes = canon.url_hash64(variants)
        assert len(set(hashes.tolist())) == 1

    def test_hosts_of(self):
        assert list(canon.hosts_of(["http://A.test/x", "https://b.test:1/y"])) == \
            ["a.test", "b.test"]


class TestText:
    @given(st.from_regex(r"[a-z][a-z0-9]*(_[a-z][a-z0-9]*)*", fullmatch=True))
    def test_snake_camel_roundtrip(self, s):
        assert text.camel_to_snake(text.snake_to_camel(s)) == s

    def test_case_converters(self):
        assert text.snake_to_camel("doc_type_name") == "docTypeName"
        assert text.snake_to_pascal("doc_type") == "DocType"
        assert text.camel_to_snake("DocTypeName") == "doc_type_name"

    def test_dates(self):
        assert text.parse_date_dmy("15/03/2021").year == 2021
        assert text.parse_date_dmy("not a date") is None
        assert text.parse_date_dmy(None) is None
        assert text.dmy_to_iso("5/3/2021") == "2021-03-05"
        assert text.parse_date_ymd("2021-03-05").day == 5

    def test_dates_batch(self):
        out = text.parse_dates_dmy_batch(["15/03/2021", "bad", None])
        assert str(out[0])[:10] == "2021-03-15"
        assert np.isnat(out[1]) and np.isnat(out[2])

    def test_extract_item_ids(self):
        ids = text.extract_item_ids(
            ["/page.aspx?ItemID=123&x=1", "/no-id", "?ItemID=99"])
        assert ids.tolist() == [123, -1, 99]

    def test_misc(self):
        assert text.check_header_tag("h2") and not text.check_header_tag("div")
        assert text.node_text("  x ") == "x" and text.node_text(None) is None
        assert text.query_params_url_encode({"a": 1, "b": "x"}) == "a=1&b=x"
        out = text.strip_batch(pa.array(["  a ", "b"]))
        assert out.to_pylist() == ["a", "b"]


class TestBloom:
    def test_no_false_negatives(self):
        from vbpl_web_crawl_ray.state.bloom import BloomFilter
        bf = BloomFilter(capacity=10_000, fp_rate=0.01)
        h = hashing.hash64([f"url-{i}" for i in range(5000)])
        new = bf.add(h)
        assert new.all()
        assert bf.contains(h).all()

    def test_fp_rate_bounded(self):
        from vbpl_web_crawl_ray.state.bloom import BloomFilter
        bf = BloomFilter(capacity=10_000, fp_rate=0.01)
        bf.add(hashing.hash64([f"in-{i}" for i in range(10_000)]))
        probe = hashing.hash64([f"out-{i}" for i in range(20_000)])
        fp = bf.contains(probe).mean()
        assert fp < 0.03  # 3x headroom over the 1% design point

    def test_add_reports_dupes(self):
        from vbpl_web_crawl_ray.state.bloom import BloomFilter
        bf = BloomFilter(1000)
        h = hashing.hash64(["a", "b", "a"])
        new = bf.add(h)
        assert new.tolist() == [True, True, False]
        assert bf.add(h).sum() == 0

    def test_snapshot_restore(self):
        from vbpl_web_crawl_ray.state.bloom import BloomFilter
        bf = BloomFilter(1000)
        h = hashing.hash64([f"u{i}" for i in range(500)])
        bf.add(h)
        bf2 = BloomFilter.restore(bf.snapshot())
        assert bf2.contains(h).all()
        assert bf2.count == bf.count


class TestCuckoo:
    def test_add_contains_remove(self):
        from vbpl_web_crawl_ray.state.cuckoo import CuckooFilter
        cf = CuckooFilter(capacity=1000)
        hs = hashing.hash64([f"u{i}" for i in range(800)])
        for h in hs:
            assert cf.add(int(h))
        assert cf.contains_batch(hs).all()
        # deletion works (the reason cuckoo exists here, north_rule)
        assert cf.remove(int(hs[0]))
        # and other items survive deletions
        assert cf.contains_batch(hs[1:]).all()

    def test_low_fp(self):
        from vbpl_web_crawl_ray.state.cuckoo import CuckooFilter
        cf = CuckooFilter(capacity=2000)
        for h in hashing.hash64([f"in{i}" for i in range(1500)]):
            cf.add(int(h))
        probe = hashing.hash64([f"out{i}" for i in range(5000)])
        assert cf.contains_batch(probe).mean() < 0.02

    def test_snapshot_restore(self):
        from vbpl_web_crawl_ray.state.cuckoo import CuckooFilter
        cf = CuckooFilter(500)
        hs = hashing.hash64([f"v{i}" for i in range(300)])
        for h in hs:
            cf.add(int(h))
        cf2 = CuckooFilter.restore(cf.snapshot())
        assert cf2.contains_batch(hs).all()

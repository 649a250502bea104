"""The Lance storage seam: stand-in branch always; real branch
skip-if-absent (this container ships no `lance`)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vbpl_web_crawl_ray.sources import lancefmt


def _table():
    return rd.from_pandas(pd.DataFrame({
        "image_id": [f"img{i:08d}" for i in range(40)],
        "bytes": [bytes([i % 251]) * 10 for i in range(40)],
        "w": np.arange(40, dtype=np.int32) + 48,
        "h": np.arange(40, dtype=np.int32) + 50,
        "fmt": ["png" if i % 2 == 0 else "jpeg" for i in range(40)],
        "caption": [f"cap {i}" for i in range(40)],
        "phash": np.arange(40, dtype=np.int64),
    }))


def test_roundtrip_preserves_rows_and_schema(tmp_path):
    p = str(tmp_path / "store")
    lancefmt.write_table(_table(), p)
    back = lancefmt.read_table(p).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    want = _table().to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    assert list(back.columns).sort() == list(want.columns).sort()
    pd.testing.assert_frame_equal(back[sorted(back.columns)],
                                  want[sorted(want.columns)])


def test_overwrite_is_idempotent_and_manifest_marks_standin(tmp_path):
    import json
    import os

    p = str(tmp_path / "store")
    lancefmt.write_table(_table(), p)
    lancefmt.write_table(_table(), p)          # second write: no append
    back = lancefmt.read_table(p).to_pandas()
    assert len(back) == 40
    if lancefmt.format_in_use() == "parquet-standin":
        m = json.load(open(os.path.join(p, "_lance_standin.json")))
        assert m["intended_format"] == "lance"
        assert set(m["columns"]) == {"image_id", "bytes", "w", "h",
                                     "fmt", "caption", "phash"}


@pytest.mark.skipif(lancefmt.format_in_use() != "lance",
                    reason="real lance not installed in this container")
def test_real_lance_branch(tmp_path):          # pragma: no cover
    p = str(tmp_path / "store")
    lancefmt.write_table(_table(), p)
    assert lancefmt.read_table(p).count() == 40

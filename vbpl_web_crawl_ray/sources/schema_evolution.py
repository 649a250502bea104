"""Versioned-schema reader — the engine's Alembic analogue.

The reference's tables grew columns over 12 migrations
(alembic/versions/c7a8285ff499_initial_database.py:20-93 through
30a8cc2aa2e3_add_sub_title_to_vbpl.py): a long-lived store holds parquet
written under several layouts. This module reads such a mixed-layout
store as ONE dataset in the current schema:

- ``META_VERSIONS`` pins each historical layout of the document-metadata
  table (columns were only ever APPENDED, mirroring the reference's
  ``add_column`` migrations — v1 is the initial 7-column surface, v2 the
  round-2 15-column one, v3 the current 16-column surface).
- ``group_files_by_schema`` buckets files by their parquet FOOTER schema
  (metadata-only reads — no row data touches the driver, so grouping a
  100-TB store costs one footer RPC per file).
- ``read_versioned_dataset`` returns a streaming ``ray.data.Dataset``:
  one ``read_parquet`` per layout group, a zero-copy Arrow
  ``map_batches`` that fills missing columns with typed nulls (or
  registered defaults) and casts drifted types, then a no-shuffle
  ``union``. Nothing materializes; blocks flow with backpressure.

A schema CHANGE ships as: append the field to the current schema, bump
``CURRENT_META_VERSION``, record the old layout in ``META_VERSIONS`` —
readers keep working over every store ever written, no backfill job.
"""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..stages.parse import META_SCHEMA

# historical layouts of the meta table (append-only evolution, like the
# reference's alembic chain). v1 = the initial vbpl surface
# (c7a8285ff499: so_hieu/ngay_ban_hanh/loai_van_ban/co_quan/trich_yeu/
# file_link), v2 = round 2's 15-column surface, v3 = current (16).
META_V1 = pa.schema(list(META_SCHEMA)[:7])
META_V2 = pa.schema(list(META_SCHEMA)[:15])
META_V3 = META_SCHEMA
META_VERSIONS = {1: META_V1, 2: META_V2, 3: META_V3}
CURRENT_META_VERSION = 3


def evolve_table(t: pa.Table, target: pa.Schema,
                 defaults: dict | None = None) -> pa.Table:
    """Project one Arrow table onto ``target``: present columns are kept
    (cast if the type drifted), absent ones are filled with typed nulls or
    the registered default, extra columns (e.g. a hive ``round`` key) are
    dropped. Pure Arrow — zero-copy for already-conforming columns."""
    n = len(t)
    cols = []
    for field in target:
        if field.name in t.column_names:
            col = t.column(field.name)
            if col.type != field.type:
                col = pc.cast(col, field.type)
        elif defaults and field.name in defaults:
            col = pa.chunked_array(
                [pa.array([defaults[field.name]] * n, type=field.type)])
        else:
            col = pa.chunked_array([pa.nulls(n, type=field.type)])
        cols.append(col)
    return pa.table(cols, schema=target)


def group_files_by_schema(files: list[str]) -> dict[tuple, list[str]]:
    """Bucket parquet files by footer schema (metadata-only reads)."""
    groups: dict[tuple, list[str]] = {}
    for f in sorted(files):
        sig = tuple((fld.name, str(fld.type)) for fld in pq.read_schema(f))
        groups.setdefault(sig, []).append(f)
    return groups


def read_versioned_dataset(files: list[str], target: pa.Schema,
                           defaults: dict | None = None) -> rd.Dataset:
    """Mixed-layout parquet -> one streaming Dataset in ``target``.

    One read_parquet per layout group (so Ray never has to merge
    incompatible sampled schemas), per-batch Arrow evolution, no-shuffle
    union. An empty file list yields an empty dataset with the target
    schema so downstream stages see a stable surface."""
    if not files:
        # via pandas: Ray drops the Arrow schema of a 0-row from_arrow
        # block on to_pandas, a pandas block keeps its columns
        return rd.from_pandas(target.empty_table().to_pandas())
    parts = []
    for _, group in group_files_by_schema(files).items():
        ds = rd.read_parquet(group)
        parts.append(ds.map_batches(
            lambda t, _tgt=target, _d=defaults: evolve_table(t, _tgt, _d),
            batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def read_versioned_table(files: list[str], target: pa.Schema,
                         defaults: dict | None = None) -> pa.Table:
    """Driver-side variant for point lookups / previews over SMALL stores
    (the S9 surface): evolve each file's table and concat. Not for bulk
    data — use read_versioned_dataset for that."""
    if not files:
        return target.empty_table()
    return pa.concat_tables(
        evolve_table(pq.read_table(f), target, defaults)
        for f in sorted(files))


def read_meta_versioned(out_dir: str,
                        version: int = CURRENT_META_VERSION) -> rd.Dataset:
    """The meta table of a crawl store that may span schema versions,
    presented in the requested version's layout."""
    files = sorted(glob.glob(f"{out_dir}/meta/round=*/*.parquet"))
    return read_versioned_dataset(files, META_VERSIONS[version])

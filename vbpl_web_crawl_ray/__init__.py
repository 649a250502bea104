"""vbpl_web_crawl_ray — a Ray-Data-native crawl + data-processing engine.

A from-scratch rebuild of the capabilities of Minh0511/vbpl-web-crawl
(reference at /root/reference, read-only) expressed as ray.data.Dataset
pipelines: a sharded URL frontier with politeness + robots + Bloom-filter
URL-seen membership held in stateful actors, fetch/parse/decode stages as
``map_batches`` over zero-copy Arrow batches of image+caption payload rows,
and a library of relational / dedup / similarity / text-analysis operators.

Nothing here is a port: the reference's ThreadPoolExecutor + MySQL design
(reference app/service/vbpl.py:95-114, app/helper/db.py) is re-expressed as
Ray Data streaming pipelines with actor pools for state.
"""

__version__ = "0.1.0"

"""vid_dup_finder_lib_spark — a PySpark-native near-duplicate detection and
clustering engine.

Re-expresses the query semantics of ``Farmadupe/vid_dup_finder_lib`` (a Rust
perceptual-video-hash dedup library, studied read-only at /root/reference)
over Common-Crawl-style web text, Spark-first:

* per-document signatures (MinHash / SimHash / shingles) via Arrow-vectorized
  pandas UDFs — the analog of the reference's 3D-DCT perceptual hash
  (``vid_dup_finder_lib/src/video_hashing/dct_3d.rs``),
* LSH band self-joins for candidate generation — replacing the reference's
  duration-banded O(n^2) sweep (``search_algorithm.rs:81-171``),
* exact Jaccard / Hamming verification at a scaled tolerance radius
  (``search_algorithm.rs:64,82``),
* iterative connected components + greedy matchset grouping — replacing the
  driver-side ``DisjointSet`` (``vid_dup_finder_app/src/app/disjoint_set.rs``),
* a persistent match DB (confirmed / false-positive pair tables,
  ``match_db.rs``) expressed as joins,
* incremental recompute (mtime-staleness analog,
  ``processing_fs_cache.rs:78-199``) expressed as a merge over checkpoint
  tables.

Nothing here is a port: the reference's execution engine (Rust, rayon,
in-memory Vecs) is replaced by Catalyst-planned DataFrame programs.
"""

from vid_dup_finder_lib_spark.config import SigConfig

__all__ = ["SigConfig"]
__version__ = "0.1.0"

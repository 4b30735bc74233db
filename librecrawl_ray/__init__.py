"""librecrawl_ray — a from-scratch Ray-Data-native rebuild of LibreCrawl's SEO
crawler core (reference: alok-ahirrao/LibreCrawl at /root/reference, read-only).

Architecture (SURVEY.md §7): a wave-structured BFS dataflow over a synthetic
corpus of interleaved text+media documents ``(doc_id, spans)`` —

    frontier_wave_k → politeness gating → fetch (partition-affine corpus
    lookup, actor pool) → parse (map_batches, pyarrow) → pages/links writes
    → candidate canonicalize+sha1 → within-wave dedup (groupby) → sharded
    seen-filter actors → trap gating → frontier_wave_{k+1}

plus batch report pipelines (link graph, issues, near-dup, exports) expressed
as Ray Data groupby/aggregate/sort over the written parquet tables, and a
training-data op suite (dedup, similarity search, text analysis, multimodal
plumbing) over arbitrary document tables.

No module in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by bench.py, CLIs and the pytest fixture only.
"""

__version__ = "0.1.0"

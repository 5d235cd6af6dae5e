"""ccl_spark — a PySpark-native link-graph analytics engine.

A from-scratch generalization of connected-component labeling (the
reference implementation at /root/reference, michaelleerilee/CCL) to
web-scale link graphs, built on the Spark DataFrame API:

- ``cc``         connected components (large-star / small-star union-find)
- ``pagerank``   power-iteration PageRank with dangling-mass handling
- ``lpa``        synchronous label propagation
- ``triangles``  degree-ordered triangle counting
- ``grids``      2-D slice-stack fixtures -> graph adapter (8-connectivity,
                 polar and dateline boundary rules, temporal overlap)
- ``replay``     deterministic label-numbering replay reproducing the
                 reference's exact golden label integers
- ``datagen``    seeded synthetic Common-Crawl-style pages corpus
- ``extract``    Arrow-vectorized text + hyperlink extraction
- ``edges``      edge-table builder (dedup, salt, degrees, CSR blocks)
- ``superstep``  checkpoint / lineage / resume harness for iterative jobs

Everything is DataFrame-first: Catalyst handles pushdown/pruning/joins;
iteration state is checkpointed DataFrames; the only Python on the hot
path is Arrow-batched (mapInPandas), never per-row UDFs.
"""

__version__ = "0.1.0"

"""Shipped ANN model configuration — the constants both the registry
queries (queries/extras.py) and the codebook trainer
(tools/train_codebooks.py) read.

Lives in its own import-light module so the trainer can read the target
shape WITHOUT importing queries/extras.py, whose fixed-codebook oracles
are built at import time from the CURRENT queries/codebooks.py — during
a retrain those two must be allowed to disagree for one run.

Config provenance (ANN_RECALL_r09.json, VERDICT r8 ask #2): the r8 shape
(subs=4, sub_dim=16, k=8) read recall@10 = 0.135 flat in k — the binding
constraint was the sub-quantizer count. Shipped config: 16 subspaces of
4 dims at k=64 codewords = 96 bits/vector (21.3x vs float32), reading
0.525 ADC-only / 0.925 with the RERANK=100 exact re-rank; nprobe=5 of
the k=8 fixture-scale coarse cells puts the composed IVF-PQ+rerank probe
at 0.805.
"""

KMEANS_K = 8
NPROBE = 5
KMEANS_ITERS = 5
EMB_DIM = 64

PQ_SUBS = 16
PQ_SUB_DIM = 4
PQ_K = 64
PQ_ITERS = 3
RERANK = 100  # ADC-shortlist size for the exact re-rank stage

# Realistic-cell-count serving config (ANN_RECALL_r11.json, VERDICT r10
# ask #3): at a coarse index where nprobe/k << 1 (k=64 cells on the sf1
# rotate-dup corpus), single-assignment IVF caps ivf_exact recall at
# 0.75 for nprobe/k = 0.25 — the corpus is isotropic, so a true
# neighbor's ONE cell is often unprobed. The shipped fix is ScaNN-style
# spilled assignment: store each vector in its SPILL nearest cells
# (spill=2 -> ivf_exact 0.915; composed IVF-PQ+rerank 0.85 at
# rerank=100, 0.895 at rerank=200) at 2x the 96-bit code bytes and the
# SAME probed fraction of stored rows. SPILL_NPROBE keeps the gate
# query's probe at the certified nprobe/k = 0.25 ratio against the
# fixture-scale KMEANS_K=8.
SPILL = 2
SPILL_NPROBE = 2

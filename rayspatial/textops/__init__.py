"""Training-data operators over document tables (BASELINE.json §beyond):
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), and text
analysis (language-ID, quality metrics, token counts, fingerprints).

All stages are vectorized map_batches over zero-copy Arrow; wide steps
pre-aggregate or carry per-row metadata through the shuffle so no
second join is needed.
"""

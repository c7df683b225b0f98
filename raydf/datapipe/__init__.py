"""Large-scale training-data operators — first-class engine components
beyond the reference's deduction core: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search (brute-force
and LSH-bucketed ANN), text analysis (language id, quality scoring, token
counting, fingerprinting) and multimodal column plumbing (decode stubs).
"""

from raydf.datapipe import ann, dedup, multimodal, text

__all__ = ["ann", "dedup", "multimodal", "text"]

"""Deterministic synthetic corpus + golden fixture generation (seed=42).

Mirrors how the reference froze manually-verified text into
``benchmark_output_ground_truth/raw_text_ground_truth.json`` — here the
corpus is generated with KNOWN main content, so the expected extraction
is constructed independently of the kernels (non-circular oracle).
"""

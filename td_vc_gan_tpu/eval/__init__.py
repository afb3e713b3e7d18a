"""Evaluation harness: objective VC metrics + HTML report.

The reference's ``test_scripts/`` (SURVEY.md §2.8) re-built without its
GPL/native wheel dependencies: MCD uses our own mel-cepstra + native-C++ DTW
(replacing pyworld/pysptk/fastdtw), speaker similarity uses resemblyzer when
importable with a mel-statistics d-vector fallback, ASR uses a local Whisper
checkpoint through transformers when available.
"""

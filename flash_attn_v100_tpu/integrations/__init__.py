"""Ecosystem integrations.

The reference's integration story is a fake-module shim that makes HF/unsloth
fine-tuning pick up its kernels (reference: utils/benchmarks/
benchmark_unsloth.py:8-77).  The TPU analogs here are first-class:
LoRA SFT on the flagship model (what the unsloth benchmark exercises
end-to-end) and HF-Llama checkpoint import so real weights run through the
engine.
"""

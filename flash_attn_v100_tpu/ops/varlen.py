"""Varlen (packed cu_seqlens) attention — implemented in a later milestone."""


def flash_attn_varlen_func(*args, **kwargs):
    raise NotImplementedError("varlen attention: next milestone")

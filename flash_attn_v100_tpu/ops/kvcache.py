"""KV-cache decode attention — implemented in a later milestone."""


def flash_attn_with_kvcache(*args, **kwargs):
    raise NotImplementedError("kvcache attention: next milestone")

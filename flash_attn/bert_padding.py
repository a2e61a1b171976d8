"""`flash_attn.bert_padding` — canonical-name re-export of the padded<->ragged
utilities (reference: flash_attn/bert_padding.py:9-147)."""

from flash_attn_v100_tpu.ops.padding import (
    index_first_axis,
    index_first_axis_residual,
    index_put_first_axis,
    pad_input,
    unpad_input,
    unpad_input_for_concatenated_sequences,
)

__all__ = [
    "index_first_axis", "index_first_axis_residual", "index_put_first_axis",
    "pad_input", "unpad_input", "unpad_input_for_concatenated_sequences",
]

from .lint import (
    count_exchanges,
    explain_text,
    has_broadcast_hash_join,
    pushed_filters,
    whole_stage_codegen_spans,
)

__all__ = [
    "count_exchanges",
    "explain_text",
    "has_broadcast_hash_join",
    "pushed_filters",
    "whole_stage_codegen_spans",
]

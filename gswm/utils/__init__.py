"""Shared utilities: jsonl/json IO (io_utils parity, SURVEY.md §2.3) and
profiling/tracing hooks (SURVEY.md §5)."""

from gswm.utils.io import (  # noqa: F401
    read_json,
    write_json,
    print_json,
    read_jsonlines,
    load_jsonlines,
    write_jsonlines,
    resolve_globs,
)

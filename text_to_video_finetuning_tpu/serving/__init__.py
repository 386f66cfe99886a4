"""Production serving mode (beyond the reference, which ships only a
one-shot inference CLI — reference inference.py:336-435).

`t2v-serve` keeps one warm pipeline resident and serves generation
requests over HTTP with dynamic batching: same-geometry requests are
coalesced into a single batched `diffuse` dispatch so the compiled
program amortizes across callers, which is how a TPU chip should be fed
(one large batch per dispatch, not N singleton dispatches).
"""

from .server import (BatchingWorker, GenerationRequest, T2VServer,
                     request_batch_key, request_compile_key)

__all__ = ["BatchingWorker", "GenerationRequest", "T2VServer",
           "request_batch_key", "request_compile_key"]

"""Python UDTFs — the engine's table-function extension point.

The reference's only extension hooks are scalar (``target_expr``,
counter.go:260-306) and a per-row output transform (``jq_expr``,
counter.go:439-466). Spark adds three tiers the new engine exposes:
scalar UDF → Arrow-batched pandas UDF (the multimodal/similarity paths) →
Python UDTF (one input row → many output rows, usable from SQL via
``LATERAL``).

Scale note: a plain Python UDTF is the SLOW path (per-row Python
round-trip). It exists for semantics no relational rewrite can express —
and even then the first question should be "can this be explode +
built-ins instead?" (the tokenizer here CAN: see
``text.clean_tokens``/``posexplode`` — the registry query keeps the UDTF
variant precisely to pin the extension-point contract with an oracle).
For bulk use, ``useArrow=True`` batches the transfer.
"""

from __future__ import annotations


def tokenize_positions_udtf():
    """Factory for the (pos, token) tokenizer UDTF.

    Decorating at call time (not import time) keeps the module importable
    without an active Spark session; registration:
    ``spark.udtf.register("tokenize_udtf", tokenize_positions_udtf())``.
    Tokenization matches ``text.clean_tokens``: lowercase, split on
    whitespace runs, drop empties; ``pos`` is the 0-based position in the
    cleaned token sequence.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenizePositions:
        def eval(self, text: str):  # noqa: D401 - UDTF contract
            if text is None:
                return
            for i, tok in enumerate(t for t in text.lower().split() if t):
                yield i, tok

    return TokenizePositions

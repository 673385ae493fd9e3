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


def jq_udtf():
    """Factory for the ``jq(json_text, program)`` table function.

    Lifts the pure-Python mini-jq interpreter (``jq_eval``) onto the SQL
    surface: each input row's JSON text runs through the program and every
    jq output becomes one row of compact JSON — usable as
    ``SELECT ... FROM t, LATERAL jq_udtf(payload, '.items[]')``, the SQL
    twin of ``apply_jq_generic``'s DataFrame form (and of gojq's 0..n
    iterator loop, reference counter.go:439-466).

    Programs compile once per (process, program) via a small cache; bad
    JSON rows yield nothing (the per-record-failure discipline of S4, not
    a job failure). Registration:
    ``spark.udtf.register("jq_udtf", jq_udtf())``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="value string")
    class JqTable:
        _cache: dict = {}

        def eval(self, json_text: str, program: str):  # noqa: D401
            import json as _json

            if json_text is None or program is None:
                return
            prog = self._cache.get(program)
            if prog is None:
                from kinesis_data_counter_spark.jq_eval import compile_program

                prog = self._cache[program] = compile_program(program)
            try:
                value = _json.loads(json_text)
            except ValueError:
                return  # bad record: skip, never fail the job (S4 rule)
            from kinesis_data_counter_spark.jq_eval import JqRuntimeError, dumps

            # Same per-record-failure discipline for jq RUNTIME errors
            # (e.g. a type mismatch on one heterogeneous row): outputs
            # already produced are kept, the record's remainder is skipped,
            # the job never fails. Mirrors the bad-JSON path above.
            try:
                for out in prog(value):
                    yield (dumps(out),)
            except JqRuntimeError:
                return

    return JqTable

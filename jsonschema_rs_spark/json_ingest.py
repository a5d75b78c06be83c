"""Arbitrary-JSON ingestion: validate raw JSON-string columns.

The reference validates ANY parsed JSON value (``validator.rs:29-33``,
``jsonschema-py/src/ser.rs`` converts arbitrary Python objects) — the typed
engine in :mod:`compiler` instead assumes a pre-typed table.  This module
closes that generality gap Spark-natively: one ``try_parse_json`` per
document into Spark 4's VARIANT type, then every keyword lowered to
variant-aware Column expressions — ``schema_of_variant`` for exact JSON
type tags (JSON ``null`` ≠ absent ≠ wrong type), ``try_variant_get`` casts
gated on the tag so Spark's lenient coercions (number→string) can never
leak a wrong-typed value into a check, ``map<string,variant>`` /
``array<variant>`` casts + higher-order functions for objects and arrays.

Scale notes: the whole validation is ONE projection over ONE parse per
document — no shuffle, no Python in the hot path (the only Python-backed
expressions are the same three pandas-UDF formats the typed engine uses,
and only at doc scope).  Variant parse + path extraction are JVM
expressions, so the plan stays embarrassingly parallel in input splits
exactly like the typed ``violations`` plan.

``unevaluatedProperties``/``unevaluatedItems`` lower natively (round 5):
in expression land the 2020-12 annotation algebra — claims count only
from schema objects that were APPLIED and whose claim keywords VALIDATED
— composes directly as per-row gate Columns, bound once per row via a
single-element transform.  The few remaining unsupported constructs
raise :class:`JsonIngestUnsupported` at compile time (never at action
time): ECMA patterns that java.util.regex rejects (no Python fallback
inside HOF lambdas) and pandas-UDF formats under an array/map lambda
(no per-element Python).  Callers (the suite harness) fall back to the
typed path for those.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler import _as_double, _sniff_draft
from jsonschema_rs_spark.functions.ecma import ecma_to_java
from jsonschema_rs_spark.functions.formats import FORMATS, FORMATS_PY
from jsonschema_rs_spark.metaschema import validate_against_metaschema
from jsonschema_rs_spark.spec import SpecError, resolve_refs, validate_spec


class JsonIngestUnsupported(ValueError):
    """Schema uses a construct the variant lowering cannot express; the
    caller should fall back to the typed-table engine."""


_INTERNAL = ("$__abs__", "$__lenient__")


def _null_str() -> Column:
    return F.lit(None).cast("string")


class JV:
    """One JSON instance node: a VARIANT Column where SQL NULL = absent
    (vs ``is_variant_null`` = JSON null)."""

    __slots__ = ("e",)

    def __init__(self, e: Column):
        self.e = e

    @property
    def tag(self) -> Column:
        """JSON type tag: null/string/boolean/integer/number/object/array;
        SQL NULL when the node is absent.  ``integer`` means the token was
        an integer literal (BIGINT or DECIMAL(p,0) — variant preserves the
        exact parse, which is what draft-4 strict-integer needs)."""
        e = self.e
        sch = F.schema_of_variant(e)
        return (F.when(e.isNull(), _null_str())
                .when(F.is_variant_null(e), F.lit("null"))
                .when(sch.startswith("OBJECT"), F.lit("object"))
                .when(sch.startswith("ARRAY"), F.lit("array"))
                .when(sch == "STRING", F.lit("string"))
                .when(sch == "BOOLEAN", F.lit("boolean"))
                .when((sch == "BIGINT")
                      | sch.rlike(r"^DECIMAL\([0-9]+,0\)$"),
                      F.lit("integer"))
                .otherwise(F.lit("number")))

    # tag-gated extractions: the gate is what keeps Spark's lenient
    # variant casts (5 -> "5") from leaking cross-type values
    @property
    def s(self) -> Column:
        return F.when(self.tag == "string",
                      F.try_variant_get(self.e, "$", "string"))

    @property
    def nd(self) -> Column:
        return F.when(self.tag.isin("integer", "number"),
                      F.try_variant_get(self.e, "$", "double"))

    @property
    def ndec(self) -> Column:
        """Exact integer value (38 digits) — only for integer-tagged."""
        return F.when(self.tag == "integer",
                      F.try_variant_get(self.e, "$", "decimal(38,0)"))

    @property
    def b(self) -> Column:
        return F.when(self.tag == "boolean",
                      F.try_variant_get(self.e, "$", "boolean"))

    @property
    def arr(self) -> Column:
        return F.try_variant_get(self.e, "$", "array<variant>")

    @property
    def m(self) -> Column:
        return F.try_variant_get(self.e, "$", "map<string,variant>")

    def member(self, key: str) -> "JV":
        return JV(F.try_element_at(self.m, F.lit(key)))

    @property
    def absent(self) -> Column:
        return self.e.isNull()

    @property
    def obs(self) -> Column:
        """Deterministic observed rendering: raw string for strings, the
        variant's JSON text otherwise."""
        return F.when(self.tag == "string", self.s).otherwise(
            self.e.try_cast("string"))


class SJV:
    """A plain STRING treated as a JSON instance (propertyNames applies
    subschemas to each member NAME)."""

    __slots__ = ("_s",)

    def __init__(self, s: Column):
        self._s = s

    @property
    def tag(self) -> Column:
        return F.lit("string")

    @property
    def s(self) -> Column:
        return self._s

    @property
    def nd(self) -> Column:
        return F.lit(None).cast("double")

    ndec = nd
    b = property(lambda self: F.lit(None).cast("boolean"))
    arr = property(lambda self: F.lit(None).cast("array<variant>"))
    m = property(lambda self: F.lit(None).cast("map<string,variant>"))

    def member(self, key: str):
        return JV(F.lit(None).cast("variant"))

    @property
    def absent(self) -> Column:
        return self._s.isNull()

    @property
    def obs(self) -> Column:
        return self._s


def _and_all(preds: list[Column]) -> Column:
    out = F.lit(True)
    for p in preds:
        out = out & p
    return out


def _or_all(preds: list[Column]) -> Column:
    out = F.lit(False)
    for p in preds:
        out = out | p
    return out


def _gand(a, b) -> Column:
    """Conjunction where None = unconditionally true (claim-source gates)."""
    if a is None:
        return b
    if b is None:
        return a
    return F.coalesce(a, F.lit(False)) & F.coalesce(b, F.lit(False))


def _java_pattern(pat: str, where: str) -> str:
    java = ecma_to_java(pat)
    if java is None:
        raise JsonIngestUnsupported(
            f"pattern {pat!r} at {where} does not compile in java.util.regex"
            " (no Python fallback on the variant path)")
    return java


# JSON-semantic deep equality against a PYTHON literal ---------------------

def _jeq(jv, lit: Any) -> Column:
    t = jv.tag
    if lit is None:
        return t == "null"
    if isinstance(lit, bool):
        return (t == "boolean") & (jv.b == F.lit(lit))
    if isinstance(lit, int) and 2 ** 53 < abs(lit) < 10 ** 37:
        # exact big-integer equality via decimal (1e15-scale doubles lie);
        # beyond 37 digits no decimal literal exists — double equality is
        # the documented residual there
        return (t == "integer") & (jv.ndec == F.lit(Decimal(lit)))
    if isinstance(lit, (int, float)):
        # 1 == 1.0 per JSON Schema numeric equality
        return t.isin("integer", "number") & (jv.nd == F.lit(_as_double(lit)))
    if isinstance(lit, str):
        return (t == "string") & (jv.s == F.lit(lit))
    if isinstance(lit, list):
        a = jv.arr
        p = (t == "array") & (F.size(a) == len(lit))
        for i, sub in enumerate(lit):
            p = p & _jeq(JV(F.try_element_at(a, F.lit(i + 1))), sub)
        return p
    if isinstance(lit, dict):
        m = jv.m
        p = (t == "object") & (F.size(m) == len(lit))
        for k, sub in lit.items():
            p = p & F.coalesce(
                _jeq(JV(F.try_element_at(m, F.lit(k))), sub), F.lit(False))
        return p
    raise SpecError(f"unsupported literal in enum/const: {lit!r}")


# canonical rendering for uniqueItems (JSON equality: 1 == 1.0,
# true != 1, key order irrelevant) — bounded structural depth, then the
# variant's own JSON text (documented approximation past depth 4)
_CANON_DEPTH = 4


def _canon(jv, depth: int = _CANON_DEPTH) -> Column:
    t = jv.tag
    # numeric canon (round 6, ADVICE): integer-tagged values render via
    # the exact decimal(38,0) so big integers beyond 2^53 stay distinct;
    # number-tagged INTEGRAL doubles render through the same decimal form
    # so 1 == 1.0 still holds; everything else (fractional, >38-digit)
    # keeps the double rendering on both tags, preserving equality.
    int_s = F.coalesce(jv.ndec.cast("string"), jv.nd.cast("string"))
    flt = jv.nd
    flt_s = F.coalesce(
        F.when((flt % F.lit(1.0)) == 0,
               flt.try_cast("decimal(38,0)").cast("string")),
        flt.cast("string"))
    scalar = (F.when(t == "null", F.lit("z:"))
              .when(t == "boolean", F.concat(F.lit("b:"),
                                             jv.b.cast("string")))
              .when(t == "integer", F.concat(F.lit("n:"), int_s))
              .when(t == "number", F.concat(F.lit("n:"), flt_s))
              .when(t == "string",
                    F.concat(F.lit("s:"), F.length(jv.s).cast("string"),
                             F.lit(":"), jv.s)))
    if depth <= 0:
        return F.coalesce(scalar,
                          F.concat(F.lit("v:"), jv.e.try_cast("string")))
    arr_c = F.concat(
        F.lit("a:["),
        F.concat_ws("|", F.transform(
            jv.arr, lambda el: _canon(JV(el), depth - 1))),
        F.lit("]"))
    # objects: canonical = sorted 'len(k):k=canon(v)' entries
    obj_entries = F.transform(
        F.map_keys(jv.m),
        lambda k: F.concat(F.length(k).cast("string"), F.lit(":"), k,
                           F.lit("="),
                           _canon(JV(F.try_element_at(jv.m, k)), depth - 1)))
    obj_c = F.concat(F.lit("o:{"),
                     F.concat_ws("|", F.array_sort(obj_entries)),
                     F.lit("}"))
    return (F.when(t == "array", arr_c)
            .when(t == "object", obj_c)
            .otherwise(scalar))


# --------------------------------------------------------------------------
# keyword lowering over a variant node
# --------------------------------------------------------------------------

_TYPE_NAMES = ("null", "boolean", "object", "array", "number",
               "string", "integer")


class _JsonLowerer:
    """Walks a RESOLVED spec over a variant node and emits (cells, valid):
    ``cells`` = [(constraint_id, pred, observed)] for the violations
    stream (conjunctive scopes only — combinator branches collapse into
    one cell, reference basic-output granularity for failed branches);
    ``valid`` = the node's full validity Column (used by combinators).

    The structural walk mirrors the typed engine's ``_Lowered`` contract
    (compiler.py) but the instance domain is JSON-via-variant, so absent /
    JSON-null / wrong-type distinctions are native instead of
    typed-column approximations."""

    def __init__(self, draft: int | None, options):
        self.draft = draft
        self.options = options

    # -- helpers -----------------------------------------------------------

    def _since(self, introduced: int) -> bool:
        """Keyword known under the current draft? (unknown keywords are
        annotations, reference compiler.rs:413-416)."""
        d = self.draft
        return d is None or d >= introduced

    def lower(self, schema: Any, jv, path: tuple[str, ...],
              in_lambda: bool = False) -> tuple[list, Column]:
        cells: list[tuple[str, Column, Column]] = []
        if schema is True or schema == {}:
            return cells, F.lit(True)
        if schema is False:
            cid = "/".join(path) or "false"
            pred = jv.absent
            cells.append((cid, pred, jv.obs))
            return cells, pred
        if not isinstance(schema, dict):
            raise SpecError(f"schema must be dict/bool, got {schema!r}")

        t = jv.tag
        preds: list[Column] = []

        def emit(kw_path: tuple[str, ...], pred: Column,
                 obs: Optional[Column] = None):
            # absent node passes every keyword (presence is the parent's
            # concern via required/dependencies)
            gated = jv.absent | F.coalesce(pred, F.lit(False))
            cells.append(("/".join(kw_path), gated,
                          jv.obs if obs is None else obs))
            preds.append(gated)

        def valid_of(sub, sub_jv, seg: tuple[str, ...],
                     lam: bool) -> Column:
            _, v = self.lower(sub, sub_jv, path + seg, in_lambda=lam)
            return v

        # ---- type --------------------------------------------------------
        if "type" in schema:
            names = schema["type"]
            if isinstance(names, str):
                names = [names]
            for n in names:
                if n not in _TYPE_NAMES:
                    raise SpecError(f"unknown type {n!r} at {'/'.join(path)}")
            emit(path + ("type",), _or_all(
                [self._type_pred(n, jv, t) for n in names]))

        # ---- enum / const ------------------------------------------------
        if "enum" in schema:
            emit(path + ("enum",),
                 _or_all([_jeq(jv, m) for m in schema["enum"]]))
        if "const" in schema and self._since(6):
            emit(path + ("const",), _jeq(jv, schema["const"]))

        # ---- numeric -----------------------------------------------------
        self._numeric(schema, jv, t, path, emit)

        # ---- string ------------------------------------------------------
        self._string(schema, jv, t, path, emit, in_lambda)

        # ---- object ------------------------------------------------------
        self._object(schema, jv, t, path, emit, cells, preds, in_lambda)

        # ---- array -------------------------------------------------------
        self._array(schema, jv, t, path, emit, in_lambda)

        # ---- combinators -------------------------------------------------
        if "allOf" in schema:
            for i, sub in enumerate(schema["allOf"]):
                sub_cells, v = self.lower(sub, jv, path + ("allOf", str(i)),
                                          in_lambda=in_lambda)
                cells.extend(sub_cells)
                preds.append(v)
        if "anyOf" in schema:
            vs = [valid_of(sub, jv, ("anyOf", str(i)), in_lambda)
                  for i, sub in enumerate(schema["anyOf"])]
            emit(path + ("anyOf",), _or_all(vs))
        if "oneOf" in schema:
            vs = [valid_of(sub, jv, ("oneOf", str(i)), in_lambda)
                  for i, sub in enumerate(schema["oneOf"])]
            cnt = F.lit(0)
            for v in vs:
                cnt = cnt + F.when(v, 1).otherwise(0)
            emit(path + ("oneOf",), cnt == 1)
        if "not" in schema:
            v = valid_of(schema["not"], jv, ("not",), in_lambda)
            emit(path + ("not",), ~v | jv.absent)
        if "if" in schema and self._since(7):
            cond = valid_of(schema["if"], jv, ("if",), in_lambda)
            tv = (valid_of(schema["then"], jv, ("then",), in_lambda)
                  if "then" in schema else F.lit(True))
            ev = (valid_of(schema["else"], jv, ("else",), in_lambda)
                  if "else" in schema else F.lit(True))
            emit(path + ("if",),
                 F.when(cond, tv).otherwise(ev))

        valid = jv.absent | _and_all([F.coalesce(p, F.lit(False))
                                      for p in preds])
        return cells, valid

    # -- type pred ---------------------------------------------------------

    def _type_pred(self, name: str, jv, t: Column) -> Column:
        if name == "integer":
            strict = t == "integer"
            if self.draft == 4:
                # draft-4: 1.0 is NOT an integer (legacy/type_draft_4.rs:
                # 113-114 is_u64/is_i64).  Variant parses an integer
                # LITERAL in i64 range as BIGINT but a fractional-form
                # literal (1.0) as DECIMAL(p,0) — so BIGINT = integer
                # literal.  Past i64, genuine integer literals also land
                # in DECIMAL(p,0); serde accepts u64 there, so extend by
                # value range [2^63, 2^64) (the fractional-form literal in
                # that window is a documented mis-classification; the
                # reference's own guarantee stops at u64).
                sch = F.schema_of_variant(jv.e)
                u64_ext = ((jv.ndec >= F.lit(Decimal(2 ** 63)))
                           & (jv.ndec < F.lit(Decimal(2 ** 64))))
                return (sch == F.lit("BIGINT")) | (strict & u64_ext)
            return strict | ((t == "number") & (jv.nd == F.floor(jv.nd)))
        if name == "number":
            return t.isin("integer", "number")
        return t == F.lit(name)

    # -- numeric keywords --------------------------------------------------

    def _num_cmp(self, jv, bound, op: str) -> Column:
        """Bound compare over the JSON number: double math, with the exact
        decimal path for integer-tagged values against big integer bounds
        (mirrors compiler._bound_pred)."""
        if isinstance(bound, int) and not isinstance(bound, bool) \
                and 2 ** 53 < abs(bound) < 10 ** 37:
            dec = getattr(jv.ndec, op)(F.lit(Decimal(bound)))
            dbl = getattr(jv.nd, op)(F.lit(_as_double(bound)))
            return F.when(jv.tag == "integer", dec).otherwise(dbl)
        return getattr(jv.nd, op)(F.lit(_as_double(bound)))

    def _numeric(self, schema, jv, t, path, emit):
        num = t.isin("integer", "number")

        def gate(p):
            return ~num | p

        if "minimum" in schema:
            v = schema["minimum"]
            op = "__ge__"
            if self.draft == 4 and schema.get("exclusiveMinimum") is True:
                op = "__gt__"
            emit(path + ("minimum",), gate(self._num_cmp(jv, v, op)))
        if "maximum" in schema:
            v = schema["maximum"]
            op = "__le__"
            if self.draft == 4 and schema.get("exclusiveMaximum") is True:
                op = "__lt__"
            emit(path + ("maximum",), gate(self._num_cmp(jv, v, op)))
        for kw, op in (("exclusiveMinimum", "__gt__"),
                       ("exclusiveMaximum", "__lt__")):
            if kw in schema and isinstance(schema[kw], (int, float)) \
                    and not isinstance(schema[kw], bool):
                if self.draft == 4:
                    raise SpecError(
                        f"numeric {kw} is a draft-6+ form; draft 4 uses the"
                        " boolean flag")
                emit(path + (kw,), gate(self._num_cmp(jv, schema[kw], op)))
        if "multipleOf" in schema:
            q = schema["multipleOf"]
            from jsonschema_rs_spark.compiler import _multiple_of_decimal

            ratio = jv.nd / F.lit(_as_double(q))
            approx = F.abs(ratio - F.round(ratio, 0)) < F.lit(1e-9)
            kd = _multiple_of_decimal(q)
            if kd is not None:
                # variant keeps the literal's exact decimal — extract it
                # directly (no double round-trip needed for ≤6-scale
                # literals; mirrors compiler._lower_multiple_of)
                xd = F.when(t.isin("integer", "number"),
                            F.try_variant_get(jv.e, "$", "decimal(38,6)"))
                exact = xd.isNotNull() & (xd.cast("double") == jv.nd)
                flt = F.when(exact, xd % F.lit(kd) == 0).otherwise(approx)
            else:
                flt = approx
            if isinstance(q, int) and not isinstance(q, bool) \
                    and abs(q) < 10 ** 37:
                # decimal modulo keeps integer-tagged values exact past
                # 2^53; a >37-digit divisor cannot be a decimal literal
                # (fuzz-found), so it falls to the double path
                p = F.when(jv.tag == "integer",
                           jv.ndec % F.lit(Decimal(q)) == 0).otherwise(flt)
            else:
                p = flt
            emit(path + ("multipleOf",), gate(p))

    # -- string keywords ---------------------------------------------------

    def _string(self, schema, jv, t, path, emit, in_lambda):
        is_s = t == "string"

        def gate(p):
            return ~is_s | p

        if "minLength" in schema:
            emit(path + ("minLength",),
                 gate(F.length(jv.s) >= schema["minLength"]))
        if "maxLength" in schema:
            emit(path + ("maxLength",),
                 gate(F.length(jv.s) <= schema["maxLength"]))
        if "pattern" in schema:
            java = _java_pattern(schema["pattern"], "/".join(path))
            emit(path + ("pattern",), gate(jv.s.rlike(java)))
        fmt = schema.get("format")
        validate_formats = self.options.validate_formats
        if validate_formats is None:
            validate_formats = self.draft in (None, 4, 6, 7)
        if fmt is not None and validate_formats:
            builder = (self.options.custom_formats.get(fmt)
                       or FORMATS.get(fmt))
            if builder is None:
                if not self.options.ignore_unknown_formats:
                    raise SpecError(f"unknown format {fmt!r}")
            else:
                if in_lambda and fmt in FORMATS_PY \
                        and fmt not in self.options.custom_formats:
                    raise JsonIngestUnsupported(
                        f"format {fmt!r} is pandas-UDF-backed and cannot "
                        "run inside an array/map lambda on the variant "
                        "path")
                emit(path + ("format",), gate(builder(jv.s)))
        # contentEncoding/contentMediaType assert only under draft 7 (and
        # merged) like the typed engine; 2019+ = annotation
        if self.draft in (None, 7):
            enc = schema.get("contentEncoding")
            enc_support = self.options.content_encoding_support
            if enc == "base64" and enc_support is True:
                emit(path + ("contentEncoding",),
                     gate(F.try_to_binary(jv.s, F.lit("base64"))
                          .isNotNull()))
            mt = schema.get("contentMediaType")
            mt_support = self.options.content_media_type_support
            if mt == "application/json" and mt_support is True \
                    and schema.get("contentEncoding") is None:
                emit(path + ("contentMediaType",),
                     gate(F.try_parse_json(jv.s).isNotNull()))

    # -- object keywords ---------------------------------------------------

    def _object(self, schema, jv, t, path, emit, cells, preds, in_lambda):
        is_o = t == "object"
        m = jv.m

        def gate(p):
            return ~is_o | F.coalesce(p, F.lit(False))

        props = schema.get("properties") or {}
        for k, sub in props.items():
            sub_cells, v = self.lower(sub, jv.member(k),
                                      path + (k,), in_lambda=in_lambda)
            # member checks live inside the object gate
            for cid, p, obs in sub_cells:
                gp = ~is_o | F.coalesce(p, F.lit(False))
                cells.append((cid, gp, obs))
                preds.append(gp)
        if "required" in schema:
            for k in schema["required"]:
                emit(path + ("required", k),
                     gate(F.map_contains_key(m, F.lit(k))),
                     obs=F.lit("missing"))
        if "minProperties" in schema:
            emit(path + ("minProperties",),
                 gate(F.size(m) >= schema["minProperties"]))
        if "maxProperties" in schema:
            emit(path + ("maxProperties",),
                 gate(F.size(m) <= schema["maxProperties"]))
        if "propertyNames" in schema and self._since(6):
            sub = schema["propertyNames"]
            p = F.forall(F.map_keys(m),
                         lambda k: self._sub_valid(sub, SJV(k),
                                                   path + ("propertyNames",)))
            emit(path + ("propertyNames",), gate(p))
        pats = {p: s for p, s in
                (schema.get("patternProperties") or {}).items()}
        pat_java = {p: _java_pattern(p, "/".join(path
                                                 + ("patternProperties",)))
                    for p in pats}
        for pat, sub in pats.items():
            # NOTE: no default-arg lambdas — pyspark HOFs dispatch on
            # lambda ARITY, a default arg would bind an extra HOF slot.
            # Plain closures are safe: pyspark calls the lambda immediately
            # inside this loop iteration, so late binding never bites.
            java = pat_java[pat]
            matched = F.map_filter(m, lambda k, v: k.rlike(java))
            p = F.forall(F.map_values(matched),
                         lambda v: self._sub_valid(
                             sub, JV(v), path + ("patternProperties", pat)))
            emit(path + ("patternProperties", pat), gate(p))
        ap = schema.get("additionalProperties")
        if isinstance(ap, (bool, dict)) and ap is not True:
            named = list(props)

            def is_extra(k):
                cond = F.lit(True)
                if named:
                    cond = cond & ~k.isin(*named)
                for j in pat_java.values():
                    cond = cond & ~k.rlike(j)
                return cond

            extras = F.map_filter(m, lambda k, v: is_extra(k))
            if ap is False:
                p = F.size(extras) == 0
            else:
                p = F.forall(F.map_values(extras),
                             lambda v: self._sub_valid(
                                 ap, JV(v),
                                 path + ("additionalProperties",)))
            emit(path + ("additionalProperties",), gate(p))
        deps = schema.get("dependencies") or {}
        dep_req = dict(schema.get("dependentRequired") or {}) \
            if self._since(2019) else {}
        dep_sch = dict(schema.get("dependentSchemas") or {}) \
            if self._since(2019) else {}
        for k, v in deps.items():
            if isinstance(v, list):
                dep_req[k] = v
            else:
                dep_sch[k] = v
        for k, reqs in dep_req.items():
            present = F.map_contains_key(m, F.lit(k))
            p = ~present | _and_all(
                [F.map_contains_key(m, F.lit(r)) for r in reqs])
            emit(path + ("dependentRequired", k), gate(p))
        for k, sub in dep_sch.items():
            present = F.map_contains_key(m, F.lit(k))
            v = self._sub_valid(sub, jv, path + ("dependentSchemas", k))
            emit(path + ("dependentSchemas", k), gate(~present | v))
        ue = schema.get("unevaluatedProperties")
        if isinstance(ue, (dict, bool)) and self._since(2019):
            srcs = self._prop_claim_sources(schema, jv, path)
            bound = F.struct(*([
                (F.coalesce(g, F.lit(False)) if g is not None
                 else F.lit(True)).alias(f"g{j}")
                for j, (g, _, _, _) in enumerate(srcs)
            ] or [F.lit(False).alias("g_")]))

            def _claimed(b, k):
                c = F.lit(False)
                for j, (_, names, pats, allc) in enumerate(srcs):
                    cj = F.lit(allc)
                    if names:
                        cj = cj | k.isin(*names)
                    for pj in pats:
                        cj = cj | k.rlike(pj)
                    c = c | (b.getField(f"g{j}") & cj)
                return c

            entries = F.map_entries(m)
            p = F.element_at(F.transform(F.array(bound), lambda b: F.forall(
                entries,
                lambda e: _claimed(b, e.getField("key"))
                | self._sub_valid(ue, JV(e.getField("value")),
                                  path + ("unevaluatedProperties",)))), 1)
            emit(path + ("unevaluatedProperties",), gate(p))

    def _sub_valid(self, sub, sub_jv, path) -> Column:
        _, v = self.lower(sub, sub_jv, path, in_lambda=True)
        return v

    # -- unevaluated* claim sources (runtime annotation algebra) -----------
    #
    # In the variant lowering everything is already a per-row Column, so
    # the 2020-12 rule — annotations count only from schema objects that
    # were APPLIED and whose claim keywords VALIDATED — composes directly:
    # each source carries a gate Column (branch-applied AND claim-keyword
    # validity), bound ONCE per row via a single-element transform so the
    # per-key/per-position lambdas read booleans (the typed engine's
    # word_shingles trick).

    def _claim_walk(self, schema, jv, path, add):
        """Walk in-place applicators, calling ``add(s, gate, p)`` for every
        schema object applied to this instance location (gate None = root,
        unconditionally applied)."""

        def walk(s, gate, p):
            if not isinstance(s, dict):
                return
            add(s, gate, p)
            for idx, sub in enumerate(s.get("allOf", []) or []):
                walk(sub, gate, p + ("allOf", str(idx)))
            if isinstance(s.get("if"), (dict, bool)):
                cif = self._sub_valid(s["if"], jv, p + ("if",))
                walk(s["if"], _gand(gate, cif), p + ("if",))
                if isinstance(s.get("then"), (dict, bool)):
                    gt = _gand(_gand(gate, cif),
                               self._sub_valid(s["then"], jv,
                                               p + ("then",)))
                    walk(s["then"], gt, p + ("then",))
                if isinstance(s.get("else"), (dict, bool)):
                    ge = _gand(_gand(gate, ~F.coalesce(cif, F.lit(False))),
                               self._sub_valid(s["else"], jv,
                                               p + ("else",)))
                    walk(s["else"], ge, p + ("else",))
            for kw in ("anyOf", "oneOf"):
                for idx, sub in enumerate(s.get(kw, []) or []):
                    bp = p + (kw, str(idx))
                    walk(sub, _gand(gate, self._sub_valid(sub, jv, bp)),
                         bp)
            for k, sub in (s.get("dependentSchemas") or {}).items():
                present = F.map_contains_key(jv.m, F.lit(k))
                bp = p + ("dependentSchemas", k)
                walk(sub, _gand(_gand(gate, present),
                                self._sub_valid(sub, jv, bp)), bp)

        walk(schema, None, path)

    def _prop_claim_sources(self, schema, jv, path):
        """[(gate Column|None, names, java_pats, claims_all)] for
        unevaluatedProperties on this object node."""
        from jsonschema_rs_spark.compiler import _prop_claim_subset

        out: list = []

        def add(s, gate, p):
            names = tuple(s.get("properties") or {})
            pats = tuple(_java_pattern(pt, "/".join(p))
                         for pt in (s.get("patternProperties") or {}))
            allc = isinstance(s.get("additionalProperties"),
                              (dict, bool)) or (
                s is not schema and isinstance(
                    s.get("unevaluatedProperties"), (dict, bool)))
            if not (names or pats or allc):
                return
            subset = _prop_claim_subset(s)
            if subset is not None:
                gate = _gand(gate, self._sub_valid(subset, jv, p))
            out.append((gate, names, pats, allc))

        self._claim_walk(schema, jv, path, add)
        return out

    def _items_claim_sources(self, schema, jv, path):
        """[(gate Column|None, n_prefix, claims_all)] for unevaluatedItems
        on this array node."""
        from jsonschema_rs_spark.compiler import _items_claim_subset

        out: list = []

        def add(s, gate, p):
            nb, ab = 0, False
            it = s.get("items")
            if isinstance(it, (dict, bool)):
                ab = True
            if isinstance(it, list):
                nb = max(nb, len(it))
            if isinstance(s.get("prefixItems"), list):
                nb = max(nb, len(s["prefixItems"]))
            if isinstance(s.get("additionalItems"), (dict, bool)):
                ab = True
            if s is not schema and isinstance(s.get("unevaluatedItems"),
                                              (dict, bool)):
                ab = True
            if not (nb or ab):
                return
            subset = _items_claim_subset(s)
            if subset is not None:
                gate = _gand(gate, self._sub_valid(subset, jv, p))
            out.append((gate, nb, ab))

        self._claim_walk(schema, jv, path, add)
        return out

    # -- array keywords ----------------------------------------------------

    def _array(self, schema, jv, t, path, emit, in_lambda):
        is_a = t == "array"
        a = jv.arr

        def gate(p):
            return ~is_a | F.coalesce(p, F.lit(False))

        # tuple vs element forms per draft (mirrors compiler._lower_array)
        items = schema.get("items")
        prefix: list = []
        rest = None
        rest_kw = "items"
        if self.draft == 2020 or (self.draft is None
                                  and "prefixItems" in schema):
            prefix = schema.get("prefixItems") or []
            rest = items
        elif isinstance(items, list):
            prefix = items
            rest = schema.get("additionalItems")
            rest_kw = "additionalItems"
        else:
            rest = items
        for j, sub in enumerate(prefix):
            el = JV(F.try_element_at(a, F.lit(j + 1)))
            sub_cells, _v = self.lower(sub, el, path + ("items", str(j)),
                                       in_lambda=in_lambda)
            for cid, p, obs in sub_cells:
                emit(tuple(cid.split("/")),
                     ~is_a | F.coalesce(p, F.lit(False)), obs)
        n_pre = len(prefix)
        if rest is False:
            emit(path + (rest_kw,), gate(F.size(a) <= n_pre))
        elif isinstance(rest, (dict, bool)) and rest is not True:
            p = F.forall(
                F.transform(
                    a, lambda el, i: F.when(i < n_pre, F.lit(True))
                    .otherwise(self._sub_valid(rest, JV(el),
                                               path + (rest_kw,)))),
                lambda x: x)
            emit(path + (rest_kw,), gate(p))
        elif rest is True or (isinstance(rest, dict) and rest == {}):
            pass
        if "contains" in schema and self._since(6):
            sub = schema["contains"]
            cnt = F.size(F.filter(
                a, lambda el: self._sub_valid(sub, JV(el),
                                              path + ("contains",))))
            mn = schema.get("minContains", 1) if self._since(2019) else 1
            mx = schema.get("maxContains") if self._since(2019) else None
            p = cnt >= mn
            if mx is not None:
                p = p & (cnt <= mx)
            emit(path + ("contains",), gate(p))
        if "minItems" in schema:
            emit(path + ("minItems",), gate(F.size(a) >= schema["minItems"]))
        if "maxItems" in schema:
            emit(path + ("maxItems",), gate(F.size(a) <= schema["maxItems"]))
        if schema.get("uniqueItems") is True:
            canon = F.transform(a, lambda el: _canon(JV(el)))
            emit(path + ("uniqueItems",),
                 gate(F.size(F.array_distinct(canon)) == F.size(a)))
        ue = schema.get("unevaluatedItems")
        if isinstance(ue, (dict, bool)) and self._since(2019):
            srcs = self._items_claim_sources(schema, jv, path)
            cont = schema.get("contains") if self._since(6) else None
            n_col, a_col = F.lit(0), F.lit(False)
            for g, nb, ab in srcs:
                gg = F.lit(True) if g is None else F.coalesce(g,
                                                              F.lit(False))
                if ab:
                    a_col = a_col | gg
                elif nb:
                    n_col = F.greatest(
                        n_col, F.when(gg, F.lit(nb)).otherwise(F.lit(0)))
            bound = F.struct(n_col.alias("n"), a_col.alias("a"))

            def _cell(b, el, i):
                claimed = b.getField("a") | (i < b.getField("n"))
                if isinstance(cont, (dict, bool)):
                    claimed = claimed | F.coalesce(
                        self._sub_valid(cont, JV(el), path + ("contains",)),
                        F.lit(False))
                return claimed | F.coalesce(
                    self._sub_valid(ue, JV(el),
                                    path + ("unevaluatedItems",)),
                    F.lit(False))

            p = F.element_at(F.transform(F.array(bound), lambda b: F.forall(
                F.transform(a, lambda el, i: _cell(b, el, i)),
                lambda xx: xx)), 1)
            emit(path + ("unevaluatedItems",), gate(p))

# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def _compile_json(schema: Any, options=None):
    """Resolve + meta-validate the spec; return (resolved, draft, opts)."""
    from jsonschema_rs_spark.compiler import EngineOptions

    options = options or EngineOptions()
    draft = options.draft if options.draft is not None \
        else _sniff_draft(schema)
    if draft not in (None, 4, 6, 7, 2019, 2020):
        raise SpecError(f"unsupported draft {draft!r}")
    validate_spec(schema if not isinstance(schema, bool) else {},
                  set(options.custom_keywords))
    validate_against_metaschema(schema, draft)
    resolved = resolve_refs(schema, resources=options.resources or None,
                            recursion_limit=options.recursion_limit,
                            draft=draft)
    return resolved, draft, options


def json_valid_column(js: Column, schema: Any, options=None,
                      parsed: Column | None = None) -> Column:
    """Boolean validity of a raw JSON-string Column under ``schema`` —
    the arbitrary-JSON analogue of ``plans.validate.valid_column``.
    Malformed JSON (unparseable) is invalid; SQL NULL input is invalid
    (there is no document).

    ``parsed`` (round 6): an already-``try_parse_json``-ed VARIANT column
    to validate instead of re-parsing ``js``.  The constraint chain
    dereferences the document many times, and when several schemas
    validate the same column in one projection (suite replay, multi-spec
    gates) a caller-staged parse keeps it at one parse per row instead of
    one per reference."""
    resolved, draft, options = _compile_json(schema, options)
    v = parsed if parsed is not None else F.try_parse_json(js)
    _, valid = _JsonLowerer(draft, options).lower(resolved, JV(v), ())
    return v.isNotNull() & F.coalesce(valid, F.lit(False))


def validate_json_strings(df: DataFrame, json_col: str, schema: Any,
                          options=None, id_cols=("doc_id",),
                          mode: str = "violations") -> DataFrame:
    """Validate a DataFrame column of raw JSON documents.

    mode='verdicts': id columns + ``valid`` boolean.
    mode='violations': one row per failed constraint —
    ``(*id_cols, constraint_id, observed)`` — plus a ``json/parse`` row
    for unparseable documents (reference: a document that does not parse
    cannot be validated at all).
    """
    resolved, draft, options = _compile_json(schema, options)
    # stage the parsed VARIANT once per row (round 6): every constraint
    # cell dereferences the document, and composing them over the raw
    # try_parse_json expression inlined the parse dozens of times per row
    # in the final projection; a named intermediate keeps a projection
    # boundary (CollapseProject will not merge a non-trivial alias with
    # multiple consumers), so the parse runs once
    keep = list(id_cols) + ([json_col] if json_col not in id_cols else [])
    df = df.select(*keep, F.try_parse_json(F.col(json_col)).alias("__jv"))
    v = F.col("__jv")
    lw = _JsonLowerer(draft, options)
    jv = JV(v)
    cells, valid = lw.lower(resolved, jv, ())
    # SQL-NULL documents are NOT parse_ok (round 6, ADVICE): verdicts mode
    # already reported them invalid, but violations mode treated NULL as
    # parsed-and-vacuously-passing and emitted zero rows — the two modes
    # disagreed on the same input.  A NULL document now yields a
    # ``json/parse`` violation row (observed NULL: there is no text).
    parse_ok = v.isNotNull()
    if mode == "verdicts":
        ok = (F.col(json_col).isNotNull() & v.isNotNull()
              & F.coalesce(valid, F.lit(False)))
        return df.select(*id_cols, ok.alias("valid"))
    if mode != "violations":
        raise ValueError(f"unknown mode {mode!r}")
    cell_arr = F.array(*[
        F.struct(F.lit(cid).alias("constraint_id"),
                 F.coalesce(p, F.lit(False)).alias("ok"),
                 obs.cast("string").alias("observed"))
        for cid, p, obs in cells
    ]) if cells else F.array().cast(
        "array<struct<constraint_id:string,ok:boolean,observed:string>>")
    parse_cell = F.when(
        ~parse_ok,
        F.array(F.struct(
            F.lit("json/parse").alias("constraint_id"),
            F.lit(False).alias("ok"),
            F.substring(F.col(json_col), 1, 64).alias("observed"))))
    # documents that fail to parse report ONLY the parse violation; parsed
    # documents report their failed constraint cells
    all_cells = F.when(~parse_ok, parse_cell).otherwise(
        F.filter(cell_arr, lambda c: ~c.getField("ok")))
    # explode_OUTER + null filter (round 6): a plain explode lets
    # InferFiltersFromGenerate clone the whole variant cell array into a
    # size(...)>0 pre-filter, doubling the constraint evaluation per row
    out = (df.select(*id_cols, F.explode_outer(all_cells).alias("cell"))
             .filter(F.col("cell").isNotNull())
             .select(*id_cols,
                     F.col("cell.constraint_id").alias("constraint_id"),
                     F.col("cell.observed").alias("observed")))
    return out

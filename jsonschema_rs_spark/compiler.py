"""Driver-side spec → Column compiler.

The analogue of the reference's compile phase
(``crates/jsonschema/src/compiler.rs:351-434``: per-keyword dispatch building
a tree of specialized validators), inverted for a columnar engine: instead of
a validator *tree* interpreted per document, every keyword lowers to a
specialized ``pyspark.sql.Column`` *expression builder*, and all constraints
fuse into ONE projection over ONE scan (the plan-level analogue of the
reference's fused keyword variants, ``additional_properties.rs:79-864``).

Lowering is specialized by the **Spark data type** at each schema location —
the columnar analogue of the reference's compile-time monomorphization
(``maximum.rs:98-133`` u64/i64/f64 variants, ``type_.rs:295-329`` bitmasks):
a statically-satisfied keyword lowers to ``lit(True)`` and a statically-
impossible one to ``lit(False)``, for free.

Scopes:

- ``doc``     — predicate over the document root struct.
- ``element`` — predicate over one element of a doc-rooted array column
  (signature ``pred(x, i)`` with 0-based index ``i``), evaluated inside
  array higher-order functions so no shuffle and no explode is needed for
  verdicts; violation rows get ``span_index = i``.

Null semantics follow JSON Schema: an absent member (≡ NULL in the typed
world) passes every keyword except ``required`` — enforced by wrapping each
descent in ``isNull() | pred``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
)

from jsonschema_rs_spark.spec import SpecError, resolve_refs, validate_spec
from jsonschema_rs_spark.functions.ecma import (
    driver_regex_matcher,
    ecma_to_java,
    python_fallback,
)
from jsonschema_rs_spark.functions.formats import FORMATS

_INTEGRALS = (ByteType, ShortType, IntegerType, LongType)
_FRACTIONALS = (FloatType, DoubleType, DecimalType)


def _is_numeric(dt: DataType) -> bool:
    return isinstance(dt, _INTEGRALS + _FRACTIONALS)


# --------------------------------------------------------------------------
# python-check staging (Arrow adapter columns for HOF plans)
# --------------------------------------------------------------------------
#
# Spark bans Python UDFs inside higher-order-function lambdas.  Exploded
# plans evaluate predicates in plain projections, so a pandas-UDF leaf is
# legal there.  HOF plans instead *stage* each python-backed leaf as one
# array<boolean> column (``adapter(transform(arr, extract))`` — the planner
# extracts it into ArrowEvalPython), and the leaf predicate self-resolves to
# ``element_at(staged, i+1)`` whenever a staging context is active at
# plan-build time.  Because the LEAF resolves (not the whole constraint),
# any column-algebra composition wrapped around it — if/then gates, anyOf /
# oneOf / not, tuple index gates, field-descent null passes — evaluates
# identically on both paths.

_ACTIVE_STAGES: list[dict] = []


class py_stage_context:
    """Plan-build-time context: maps PyStage.stage_id -> staged column name."""

    def __init__(self, mapping: dict):
        self.mapping = mapping

    def __enter__(self):
        _ACTIVE_STAGES.append(self.mapping)
        return self.mapping

    def __exit__(self, *exc):
        _ACTIVE_STAGES.pop()
        return False


def _stage_lookup(stage_id: int):
    if _ACTIVE_STAGES and stage_id in _ACTIVE_STAGES[-1]:
        return _ACTIVE_STAGES[-1][stage_id]
    return None


@dataclass
class PyStage:
    """One stageable python-backed leaf check (element scope)."""

    stage_id: int
    # doc root -> the array the leaf's element belongs to
    array: Callable[[Column], Column]
    array_key: tuple
    # array element -> the string value the python check consumes
    extract: Callable[[Column], Column]
    py_fn: Callable[[str], bool]
    # top-level element field the extraction reads (scan-pruning hint)
    touched: Optional[frozenset] = None


# --------------------------------------------------------------------------
# compiled artifacts
# --------------------------------------------------------------------------

@dataclass
class CompiledConstraint:
    """One leaf constraint, ready to fuse into the validation projection."""

    constraint_id: str
    scope: str  # 'doc' | 'element'
    # doc:      pred(root) -> BooleanColumn ; observed(root) -> StringColumn
    # element:  pred(x, i) -> BooleanColumn ; observed(x, i) -> StringColumn
    pred: Callable[..., Column]
    observed: Callable[..., Column]
    # element scope only: doc-root -> array Column
    array: Optional[Callable[[Column], Column]] = None
    array_key: Optional[tuple[str, ...]] = None  # grouping key for fusion
    # introspection only: the plain python check when this constraint's leaf
    # is python-backed.  Plans do NOT consult this — the leaf pred resolves
    # itself through the staging context (see PyStage above), so gates and
    # combinator wrapping apply identically on staged and direct paths.
    py_fn: Optional[Callable] = None
    # introspection only: positional gate folded into pred by tuple forms
    index_gate: Optional[tuple] = None
    # doc scope only, optional: fn(node) -> array<struct<pos:int,obs:string>>
    # of FAILING positions — lets a node-level check (conditional
    # unevaluatedItems, whose claim bounds need the whole array) still emit
    # one violation row PER POSITION (round 4; reference
    # ``unevaluated_items.rs`` reports per-item errors)
    viol_positions: Optional[Callable[..., Column]] = None
    # companion both-polarity builder for the annotation-units stream:
    # fn(node) -> array<struct<pos:int,ok:boolean,obs:string>> over ALL
    # positions (same gated claim math via _gated_cells)
    unit_positions: Optional[Callable[..., Column]] = None
    # element scope: the top-level element fields this constraint reads
    # (None = unknown/whole element).  Lets plans project the array down to
    # arrays_zip(touched fields) so nested parquet pruning reaches the scan
    # even through Generate+Filter.
    touched: Optional[frozenset] = None
    # basic-output locations (reference output.rs:104-200 / paths.rs:60-106):
    # keywordLocation as a full JSON Pointer, and the instance field path
    # (element-relative at element scope, root-relative at doc scope) that
    # plans combine with the span index into instanceLocation.
    schema_path: str = ""
    instance_fields: tuple = ()


@dataclass
class CompiledSpec:
    constraints: list[CompiledConstraint]
    valid: Callable[[Column], Column]  # doc root -> boolean (is_valid fast path)
    schema: Any
    table_schema: StructType
    # python-backed element-leaf checks to stage for HOF plans
    py_stages: list[PyStage] = field(default_factory=list)


@dataclass
class EngineOptions:
    """Mirrors reference ``ValidationOptions`` (``options.rs:20-50``)."""

    # Draft dialect: 4, 6, 7, 2019, 2020, or None.  None = auto: sniff the
    # root ``$schema`` URI (reference ``options.rs:58-82``); no ``$schema``
    # -> the permissive merged dialect (round-1 behavior).  The draft
    # controls draft-4 boolean vs numeric exclusive bounds, tuple ``items``
    # vs ``prefixItems``, and the format-assertion default below.
    draft: int | None = None
    # None = per-draft default: formats ASSERT under drafts 4/6/7 (and the
    # merged dialect), and are annotation-only under 2019-09/2020-12 unless
    # explicitly enabled — the spec's format-vocabulary split, mirrored by
    # the reference's should_validate_formats option.
    validate_formats: bool | None = None
    ignore_unknown_formats: bool = True
    # $recursiveRef/$dynamicRef unroll budget (reference compiles dynamic-
    # scope thunks, ref_.rs:82-155; a columnar plan needs a finite tree).
    # On a typed table, a limit >= the type's nesting depth is EXACT:
    # deeper instances cannot exist.
    recursion_limit: int = 3
    # name -> factory(value, dtype) -> (pred_builder, observed_builder)
    custom_keywords: dict[str, Callable] = field(default_factory=dict)
    custom_formats: dict[str, Callable[[Column], Column]] = field(default_factory=dict)
    # uri -> schema dict: extra $ref-addressable resources, supplied on the
    # driver (the registry analogue, ``registry.rs:103-261``; retrieval is
    # always ahead-of-time — never on executors; see ``retriever.fetch_
    # resources`` for the ahead-of-time URL fetcher analogue of
    # ``retriever.rs``)
    resources: dict[str, Any] = field(default_factory=dict)
    # name -> (string Column -> boolean Column): custom contentEncoding /
    # contentMediaType checks (reference ``options.rs:137-258``); built-ins
    # (base64, application/json) can be overridden by name.
    custom_encodings: dict[str, Callable[[Column], Column]] = field(
        default_factory=dict)
    custom_media_types: dict[str, Callable[[Column], Column]] = field(
        default_factory=dict)
    # support-removal toggles — the reference's per-name
    # ``without_content_encoding_support("base64")`` /
    # ``without_content_media_type_support("application/json")``
    # (``options.rs:152-258``).  True = all supported (default), False =
    # keyword is pure annotation, a collection of names = those specific
    # encodings/media types are removed (they annotate; others still
    # assert).
    content_encoding_support: Any = True
    content_media_type_support: Any = True


# --------------------------------------------------------------------------
# lowering context
# --------------------------------------------------------------------------

def _sp(ctx) -> tuple:
    """The node's effective schema pointer (falls back to the compact path)."""
    return ctx.spointer if ctx.spointer is not None else ctx.path


def _esc_pointer(seg: str) -> str:
    """RFC 6901 JSON Pointer token escaping."""
    return seg.replace("~", "~0").replace("/", "~1")


@dataclass
class _Ctx:
    dtype: DataType
    path: tuple[str, ...]          # compact schema pointer segments
    scope: str                     # 'doc' | 'element'
    # FULL schema JSON Pointer segments (includes 'properties' etc.) for
    # basic-output keywordLocation (reference paths.rs:60-106); compact
    # `path` stays the stable constraint_id.  None = same as `path`.
    spointer: Optional[tuple[str, ...]] = None
    # data path: pure struct-field descent from the scope root (excludes
    # combinator segments like allOf/0) — used to build array accessors
    dpath: tuple[str, ...] = ()
    # True while the node is reachable from the scope root via struct fields
    # only (element-scope violation rows are only possible then)
    elementable: bool = True
    # for scope='element': doc-root -> the array this element belongs to
    array: Optional[Callable[[Column], Column]] = None
    array_key: Optional[tuple[str, ...]] = None
    # element scope: True when a python-backed leaf here can be staged as an
    # Arrow adapter column (single array, pure field descent from the
    # element root).  False inside nested arrays / contains / map values /
    # propertyNames, where no per-element staged lookup exists.
    stageable: bool = False
    options: EngineOptions = field(default_factory=EngineOptions)

    def cid(self, *extra: str) -> str:
        return "/".join(self.path + tuple(extra))


@dataclass
class _Lowered:
    """Constraints emitted at a node + the node's combined validity fn
    (used by combinators; relative to the node's own instance column)."""

    constraints: list[CompiledConstraint]
    valid: Callable[..., Column]   # (x) at doc scope; (x, i) at element scope


def _true(*_a) -> Column:
    return F.lit(True)


def _and(fns: list[Callable[..., Column]]) -> Callable[..., Column]:
    if not fns:
        return _true

    def combined(*a):
        out = fns[0](*a)
        for f in fns[1:]:
            out = out & f(*a)
        return out

    return combined


def _obs_str(dt: DataType) -> Callable[[Column], Column]:
    """Observed-value rendering; complex types via to_json so the string is
    deterministic (struct field order is fixed by the table schema)."""
    if isinstance(dt, (StructType, ArrayType, MapType)):
        return lambda c: F.to_json(c)
    return lambda c: c.cast("string")


# --------------------------------------------------------------------------
# keyword lowerings (value-level; each returns pred over the node instance)
# --------------------------------------------------------------------------


def _as_double(v) -> float:
    """float(v), saturating to ±inf for integers beyond float range
    (fuzz-found OverflowError on 10**400-scale bounds — comparisons
    against an unrepresentable bound degrade gracefully to ±inf)."""
    try:
        return float(v)
    except OverflowError:
        import math

        return math.inf if v > 0 else -math.inf


def _bound_pred(v, op: str, dt: DataType) -> Callable[[Column], Column]:
    """min/max/exclusive bound comparison, EXACT past 2^53.

    The reference compares u64/i64/f64 exactly (``keywords/maximum.rs:
    48-60``, torture values 2^54±1 at ``:141-145``).  Spark long-vs-long
    literal comparison is already exact; the lossy case is a FRACTIONAL
    column against an integer bound beyond 2^53 — Catalyst promotes the
    long literal to double and the bound itself rounds.  There the compare
    runs in decimal(38,6) (doubles within ±1 of any >2^53 integer bound are
    integral, so the cast is exact where it matters), falling back to the
    double compare far from the bound where decimal would overflow.
    Integer bounds beyond int64 always take a decimal literal."""
    exact_int = isinstance(v, int) and not isinstance(v, bool)
    if exact_int and abs(v) >= 10 ** 37:
        # beyond what a decimal(38) literal can carry: double compare is
        # the best available (documented residual; the reference's u64/i64
        # range tops out at 2^64 anyway)
        return lambda x, _op=op, _fv=_as_double(v): getattr(x, _op)(F.lit(_fv))
    if exact_int and abs(v) >= 10 ** 31 and isinstance(dt, _FRACTIONALS) \
            and not (isinstance(dt, DecimalType) and dt.scale == 0):
        # beyond decimal(38,6)'s 32 integer digits the NEAR-bound compare
        # can no longer run in decimal, so the whole compare is double
        # (documented residual; the reference's exactness guarantee tops
        # out at 2^64 ≈ 1.8e19 — round 5 moved this down from 1e37: bounds
        # in [1e31, 1e37) used to take the decimal path whose 1e31
        # far-guard was unsound for values near such a bound)
        return lambda x, _op=op, _fv=_as_double(v): getattr(x, _op)(F.lit(_fv))
    if exact_int and abs(v) > 2 ** 53 and isinstance(dt, _FRACTIONALS) \
            and not (isinstance(dt, DecimalType) and dt.scale == 0):
        from decimal import Decimal

        dv, fv = Decimal(v), float(v)

        def pred(x: Column, _op=op, _dv=dv, _fv=fv) -> Column:
            # decimal(38,6) carries 32 integer digits; 1e31 keeps margin.
            # Past it the double compare is safe: the bound itself is
            # < 1e31 there is no 'far' value within rounding distance.
            far = F.abs(x) >= F.lit(1e31)
            return F.when(far, getattr(x, _op)(F.lit(_fv))).otherwise(
                getattr(x.cast("decimal(38,6)"), _op)(F.lit(_dv)))

        return pred
    if exact_int and abs(v) >= 2 ** 63:
        from decimal import Decimal

        return lambda x, _op=op, _dv=Decimal(v): getattr(x, _op)(F.lit(_dv))
    return lambda x, _op=op, _v=v: getattr(x, _op)(F.lit(_v))


def _lower_type(value: Any, dt: DataType,
                draft: int | None = None) -> Callable[[Column], Column]:
    """Reference ``keywords/type_.rs:295-329`` (+ integer-valued floats at
    ``:290-292``). Static when the typed column decides it.

    Draft 4 is stricter: ``is_integer`` is ``is_u64 || is_i64``
    (``keywords/legacy/type_draft_4.rs:113-114``) — ``1.0`` is NOT an
    integer.  A fractional Spark column holds JSON fractional
    representations, so under draft 4 ``integer`` is statically false on it.
    """
    wanted = value if isinstance(value, list) else [value]

    def one(t: str) -> Callable[[Column], Column]:
        if t == "null":
            return lambda x: x.isNull()
        if t == "string":
            return _true if isinstance(dt, StringType) else (lambda x: F.lit(False))
        if t == "boolean":
            return _true if isinstance(dt, BooleanType) else (lambda x: F.lit(False))
        if t == "integer":
            if isinstance(dt, _INTEGRALS):
                return _true
            if isinstance(dt, DecimalType) and dt.scale == 0:
                # scale-0 decimal holds exact integers (the standard Spark
                # ingestion type for JSON ints beyond int64) — is_i64/is_u64
                # in the reference's sense, under EVERY draft
                return _true
            if isinstance(dt, _FRACTIONALS):
                if draft == 4:
                    return lambda x: F.lit(False)
                return lambda x: x == F.floor(x)
            return lambda x: F.lit(False)
        if t == "number":
            return _true if _is_numeric(dt) else (lambda x: F.lit(False))
        if t == "array":
            return _true if isinstance(dt, ArrayType) else (lambda x: F.lit(False))
        if t == "object":
            return (
                _true
                if isinstance(dt, (StructType, MapType))
                else (lambda x: F.lit(False))
            )
        raise SpecError(f"unknown type {t!r}")

    preds = [one(t) for t in wanted]

    def pred(x: Column) -> Column:
        out = preds[0](x)
        for p in preds[1:]:
            out = out | p(x)
        return out

    return pred


def _num_literal(v, dt: DataType):
    """A literal Spark can carry for numeric equality against ``dt`` —
    integers beyond int64 have no long literal (fuzz-found
    NumberFormatException): impossible on integral columns (None = can
    never match), exact decimal on wide-enough decimal columns, double
    on fractional columns."""
    if isinstance(v, int) and not isinstance(v, bool) and abs(v) >= 2 ** 63:
        if isinstance(dt, DecimalType):
            from decimal import Decimal

            if len(str(abs(v))) <= dt.precision - dt.scale:
                return Decimal(v)
            return None
        if isinstance(dt, _INTEGRALS):
            return None
        return _as_double(v)
    return v


def _json_eq(dt: DataType, v: Any) -> Callable[[Column], Column]:
    """Equality with a literal under JSON semantics (reference
    ``keywords/helpers.rs:19-38``: 1 == 1.0 across representations — native
    in Spark's numeric coercion; object key order is fixed by the typed
    struct so order-insensitivity is free)."""
    if v is None:
        return lambda x: x.isNull()
    if isinstance(v, bool):
        if isinstance(dt, BooleanType):
            return lambda x: x == F.lit(v)
        return lambda x: F.lit(False)
    if isinstance(v, (int, float)):
        if _is_numeric(dt):
            lv = _num_literal(v, dt)
            if lv is None:
                return lambda x: F.lit(False)
            return lambda x, _lv=lv: x == F.lit(_lv)
        return lambda x: F.lit(False)
    if isinstance(v, str):
        if isinstance(dt, StringType):
            return lambda x: x == F.lit(v)
        return lambda x: F.lit(False)
    if isinstance(v, dict):
        if isinstance(dt, StructType):
            def eq_struct(x: Column) -> Column:
                out = F.lit(True)
                for f_ in dt.fields:
                    fv = v.get(f_.name)
                    out = out & _json_eq(f_.dataType, fv)(x.getField(f_.name))
                # keys in v not present in the struct type can never match
                extra = set(v) - {f_.name for f_ in dt.fields}
                if extra:
                    out = F.lit(False)
                return out
            return eq_struct
        return lambda x: F.lit(False)
    if isinstance(v, list):
        if isinstance(dt, ArrayType):
            elem = dt.elementType
            def eq_arr(x: Column) -> Column:
                out = F.size(x) == len(v)
                for idx, ev in enumerate(v):
                    out = out & _json_eq(elem, ev)(F.element_at(x, idx + 1))
                return out
            return eq_arr
        return lambda x: F.lit(False)
    raise SpecError(f"unsupported const/enum literal {v!r}")


def _lower_enum(values: list, dt: DataType) -> Callable[[Column], Column]:
    """Reference ``keywords/enum_.rs:108-129`` — type-bitmap prefilter is the
    static-type split below; single-value specialization falls out of isin."""
    if not isinstance(dt, (StructType, ArrayType, MapType)):
        compat = []
        for v in values:
            if (isinstance(v, str) and isinstance(dt, StringType)) \
                    or (isinstance(v, bool) and isinstance(dt, BooleanType)):
                compat.append(v)
            elif isinstance(v, (int, float)) and not isinstance(v, bool) \
                    and _is_numeric(dt):
                lv = _num_literal(v, dt)
                if lv is not None:
                    compat.append(lv)
        has_null = any(v is None for v in values)
        if not compat:
            if has_null:
                return lambda x: x.isNull()
            return lambda x: F.lit(False)
        if has_null:
            return lambda x: x.isNull() | x.isin(*compat)
        return lambda x: x.isin(*compat)
    preds = [_json_eq(dt, v) for v in values]

    def pred(x: Column) -> Column:
        out = preds[0](x)
        for p in preds[1:]:
            out = out | p(x)
        return out

    return pred


def _multiple_of_decimal(k: Any):
    """The divisor's exact decimal form when it qualifies for the
    decimal-remainder path (≤6 fractional digits, fits decimal(38,6)) —
    the analogue of the reference's exact fraction fallback
    (``multiple_of.rs:33-41``, fraction-crate values built from the
    canonical decimal rendering).  None → epsilon double math."""
    from decimal import Decimal

    if isinstance(k, bool) or not isinstance(k, (int, float)):
        return None
    # integers exact (repr(float()) would round past 2^53); floats via
    # their canonical shortest decimal rendering
    kd = Decimal(k) if isinstance(k, int) else Decimal(repr(float(k)))
    tup = kd.as_tuple()
    frac_digits = max(-tup.exponent, 0)
    int_digits = len(tup.digits) - frac_digits
    if kd == 0 or frac_digits > 6 or int_digits > 32:
        return None
    return kd


def _lower_multiple_of(k: Any, dt: DataType) -> Callable[[Column], Column]:
    """Reference ``keywords/multiple_of.rs:101-123``: integer fast path;
    floats via an EXACT decimal remainder when both the divisor and the
    value round-trip through decimal(38,6) (round 5 — the old pure-epsilon
    path went false-negative once |value/divisor| outgrew 1e9·ε, e.g.
    123456.7891 multipleOf 0.0001), with the epsilon double path (``:27-
    59``) kept for everything that does not round-trip."""
    if not _is_numeric(dt):
        return _true
    if isinstance(k, int) and isinstance(dt, _INTEGRALS) \
            and abs(k) < 2 ** 63:
        # beyond int64 a long literal cannot exist (fuzz-found
        # NumberFormatException); such divisors take the decimal/double
        # path below
        return lambda x: x % F.lit(k) == 0
    kd = _multiple_of_decimal(k)

    def pred(x: Column) -> Column:
        xf = x.cast("double")
        r = xf / F.lit(_as_double(k))
        approx = F.abs(r - F.round(r, 0)) < F.lit(1e-9)
        if kd is None:
            return approx
        xd = xf.try_cast("decimal(38,6)")
        exact = xd.isNotNull() & (xd.cast("double") == xf)
        return F.when(exact, xd % F.lit(kd) == 0).otherwise(approx)

    return pred


def _pattern_udf(pat: str):
    """Arrow-batched fallback for patterns Java can't express (reference
    rejects those at compile time, ``ecma.rs``; we accept the Python-re
    dialect as an extension when it compiles)."""
    import pandas as pd

    @F.pandas_udf(BooleanType())
    def _re_search(s: pd.Series) -> pd.Series:  # pragma: no cover - exotic
        import re as _re

        rx = _re.compile(pat)
        return s.map(lambda v: None if v is None else rx.search(v) is not None)

    return lambda x: _re_search(x)


# keyword containers whose dict KEYS are member names / patterns / anchor
# names, not schema keywords (the values are the schemas)
_NAME_CONTAINERS = frozenset((
    "properties", "patternProperties", "$defs", "definitions",
    "dependentSchemas", "dependencies",
))


def _needs_python(schema: Any, options: EngineOptions) -> bool:
    """Static check: does this subtree contain a python-backed leaf check
    (untranslatable pattern / UDF format)?  Used to reject such leaves in
    positions where their predicate would end up inside an HOF lambda with
    no staged column to read (nested arrays, contains, map values)."""
    from jsonschema_rs_spark.functions.formats import FORMATS_PY

    if not isinstance(schema, dict):
        return False
    pat = schema.get("pattern")
    if isinstance(pat, str) and ecma_to_java(pat) is None:
        return True
    fmt = schema.get("format")
    if (
        options.validate_formats
        and isinstance(fmt, str)  # a property literally named "format"
        and fmt in FORMATS_PY     # puts a dict here — not a format assert
        and fmt not in options.custom_formats
    ):
        return True
    for k, v in schema.items():
        if k in ("enum", "const"):
            continue
        if k in _NAME_CONTAINERS:
            # values of these containers ARE schemas, but their KEYS are
            # member names / patterns — never interpret a dict keyed by
            # property names as a schema (a property named "format" would
            # otherwise read as a format assertion)
            if isinstance(v, dict) and any(
                isinstance(s, dict) and _needs_python(s, options)
                for s in v.values()
            ):
                return True
            continue
        if isinstance(v, dict) and _needs_python(v, options):
            return True
        if isinstance(v, list) and any(
            isinstance(s, dict) and _needs_python(s, options) for s in v
        ):
            return True
    return False


def _claimed_props(schema: Any, conditionals: bool = True
                   ) -> tuple[set, list, bool]:
    """Static resolution of which member names are 'evaluated' by this
    schema's in-place applicators — the compile-time replacement for the
    reference's runtime annotation tracking (``unevaluated_properties.rs:
    41-752``).  With ``conditionals=True`` (legacy/upper-bound) branch
    applicators claim their members regardless of branch outcome;
    ``conditionals=False`` counts only the node itself + allOf, leaving
    if/then/else, anyOf, oneOf and dependentSchemas to a runtime-gated
    path.  ``contains`` claims nothing.
    Returns (names, patterns, all_claimed)."""
    names: set = set()
    pats: list = []
    all_claimed = False

    def walk(s):
        nonlocal all_claimed
        if not isinstance(s, dict):
            return
        names.update(s.get("properties", {}).keys())
        pats.extend(s.get("patternProperties", {}).keys())
        if isinstance(s.get("additionalProperties"), (dict, bool)):
            all_claimed = True
        if isinstance(s.get("unevaluatedProperties"), (dict, bool)) and s is not schema:
            all_claimed = True
        if conditionals:
            for key in ("if", "then", "else", "not"):
                walk(s.get(key))
        for key in (("allOf", "anyOf", "oneOf") if conditionals
                    else ("allOf",)):
            for sub in s.get(key, []) or []:
                walk(sub)
        if conditionals:
            for sub in (s.get("dependentSchemas") or {}).values():
                walk(sub)

    walk(schema)
    return names, pats, all_claimed


def _claimed_positions(schema: Any, conditionals: bool = True
                       ) -> tuple[int, bool]:
    """Static positions 'evaluated' for unevaluatedItems: max prefixItems
    length across in-place applicators; object-form items claims all.

    ``conditionals=False`` counts only the UNCONDITIONAL sources (the node
    itself + allOf, which always applies) — the conditional branches
    (if/then/else, anyOf, oneOf) are then resolved at runtime by the
    lowerer's gated path (mirroring ``_claimed_props_cond``)."""
    n_prefix = 0
    all_claimed = False

    def walk(s):
        nonlocal n_prefix, all_claimed
        if not isinstance(s, dict):
            return
        it = s.get("items")
        if isinstance(it, (dict, bool)):
            all_claimed = True
        if isinstance(it, list):
            n_prefix = max(n_prefix, len(it))
        if isinstance(s.get("prefixItems"), list):
            n_prefix = max(n_prefix, len(s["prefixItems"]))
            if isinstance(s.get("items"), (dict, bool)):
                all_claimed = True
        if isinstance(s.get("additionalItems"), (dict, bool)):
            all_claimed = True
        if conditionals:
            for key in ("if", "then", "else"):
                walk(s.get(key))
        for key in (("allOf", "anyOf", "oneOf") if conditionals
                    else ("allOf",)):
            for sub in s.get(key, []) or []:
                walk(sub)

    walk(schema)
    return n_prefix, all_claimed


# Round 5: unevaluated* claims count only from SUCCESSFUL subschemas
# (reference output.rs:139-164 — annotations are dropped from failed
# schemas).  Claim keywords whose subschemas cannot fail stay on the
# static path; the rest get a runtime validity gate.

_ANNOTATION_ONLY = frozenset({
    "title", "description", "default", "examples", "$comment",
    "deprecated", "readOnly", "writeOnly", "$id", "$schema", "$anchor",
    "$dynamicAnchor", "$recursiveAnchor", "$defs", "definitions",
    "$__abs__", "$__lenient__",
})


def _always_valid_schema(s: Any) -> bool:
    """True when the schema can never fail (claims from it are
    unconditional even under the annotations-from-successful-subschemas
    rule)."""
    if s is True:
        return True
    if isinstance(s, dict):
        return all(k in _ANNOTATION_ONLY for k in s)
    return False


def _prop_claim_subset(s: Any) -> Any:
    """The claim-producing property keywords of one source schema object
    whose failure drops its unevaluatedProperties claims — None when they
    cannot fail.  ``additionalProperties`` keeps the full name/pattern
    context so its lowering picks the same extra members."""
    subset: dict = {}
    props = {k: v for k, v in (s.get("properties") or {}).items()
             if not _always_valid_schema(v)}
    if props:
        subset["properties"] = dict(props)
    pats = {p: v for p, v in (s.get("patternProperties") or {}).items()
            if not _always_valid_schema(v)}
    if pats:
        subset["patternProperties"] = dict(pats)
    ap = s.get("additionalProperties")
    if isinstance(ap, (dict, bool)) and not _always_valid_schema(ap):
        subset["additionalProperties"] = ap
        subset.setdefault("properties", {})
        for k in (s.get("properties") or {}):
            subset["properties"].setdefault(k, True)
        subset.setdefault("patternProperties", {})
        for p in (s.get("patternProperties") or {}):
            subset["patternProperties"].setdefault(p, True)
    return subset or None


def _items_claim_subset(s: Any) -> Any:
    """The claim-producing array keywords of one source schema object
    whose failure drops its unevaluatedItems claims — None when they
    cannot fail."""
    subset: dict = {}
    pre = s.get("prefixItems")
    it = s.get("items")
    ai = s.get("additionalItems")
    if isinstance(pre, list) and any(not _always_valid_schema(x)
                                     for x in pre):
        subset["prefixItems"] = pre
    if isinstance(it, list):
        if any(not _always_valid_schema(x) for x in it):
            subset["items"] = it
    elif isinstance(it, (dict, bool)) and not _always_valid_schema(it):
        subset["items"] = it
        if isinstance(pre, list):
            subset.setdefault("prefixItems", pre)
    if isinstance(ai, (dict, bool)) and not _always_valid_schema(ai) \
            and isinstance(it, list):
        subset["additionalItems"] = ai
        subset.setdefault("items", it)
    return subset or None


# --------------------------------------------------------------------------
# the recursive lowerer
# --------------------------------------------------------------------------

class Lowerer:
    def __init__(self, table_schema: StructType, options: EngineOptions):
        self.table_schema = table_schema
        self.options = options
        self.stages: list[PyStage] = []

    # -- python-backed leaves ---------------------------------------------
    def _py_pred(self, ctx: _Ctx, py_fn: Callable[[str], bool],
                 udf_builder: Callable[[Column], Column],
                 what: str) -> Callable[..., Column]:
        """Predicate for a python-backed leaf check.

        - doc scope: the Arrow UDF runs in the plain projection — legal.
        - element scope, stageable: register a PyStage; when a staging
          context is active at plan-build time (HOF plans) the leaf resolves
          to ``element_at(staged_col, i+1)``; otherwise (exploded plans,
          which evaluate preds in plain post-explode projections) it calls
          the UDF directly.
        - element scope, not stageable: no legal evaluation site exists
          (the pred would sit inside an HOF lambda) → SpecError at compile
          time, mirroring the reference's compile-time rejection
          (``ecma.rs``) instead of a runtime AnalysisException.
        """
        if ctx.scope != "element":
            return lambda x, *i: udf_builder(x)
        if not ctx.stageable:
            raise SpecError(
                f"python-backed check ({what}) at {ctx.cid()} sits in a "
                "position with no staged-column evaluation site (nested "
                "array, contains, map values, or property names); use a "
                "Column-expressible pattern/format here, or restructure the "
                "schema so the check applies within one span-array element"
            )
        sid = len(self.stages)
        self.stages.append(PyStage(
            stage_id=sid,
            array=ctx.array,
            array_key=ctx.array_key,
            extract=self._array_accessor(ctx.dpath),
            py_fn=py_fn,
            touched=frozenset({ctx.dpath[0]}) if ctx.dpath else None,
        ))

        def pred(x: Column, *i) -> Column:
            name = _stage_lookup(sid)
            if name is not None and len(i) == 1:
                return F.element_at(F.col(name), (i[0] + 1).cast("int"))
            return udf_builder(x)

        return pred

    # -- entry ----------------------------------------------------------
    def lower_root(self, schema: Any) -> _Lowered:
        ctx = _Ctx(dtype=self.table_schema, path=(), scope="doc",
                   options=self.options)
        return self.lower(schema, ctx)

    # -- node ------------------------------------------------------------
    def lower(self, schema: Any, ctx: _Ctx) -> _Lowered:
        if schema is True or (isinstance(schema, dict) and not schema):
            return _Lowered([], _true)
        if schema is False:
            c = self._mk(ctx, ctx.cid("false"),
                         lambda x, *i: F.lit(False),
                         lambda x, *i: F.lit("schema is false"))
            return _Lowered([c], lambda *a: F.lit(False))
        if not isinstance(schema, dict):
            raise SpecError(f"schema at {ctx.cid()} must be dict/bool")

        out: list[CompiledConstraint] = []
        valids: list[Callable[..., Column]] = []

        def emit(cid: str, pred, observed):
            out.append(self._mk(ctx, cid, pred, observed))
            valids.append(pred)

        obs = _obs_str(ctx.dtype)
        dt = ctx.dtype

        # ---- custom keywords override builtins (reference custom.rs) ----
        for name, value in schema.items():
            if name in ctx.options.custom_keywords:
                factory = ctx.options.custom_keywords[name]
                pred_b, obs_b = factory(value, dt)
                emit(ctx.cid(name),
                     self._lift(pred_b), self._lift(obs_b))

        handled_custom = set(ctx.options.custom_keywords) & set(schema)

        # ---- scalar / value keywords ------------------------------------
        if "type" in schema and "type" not in handled_custom:
            emit(ctx.cid("type"),
                 self._lift(_lower_type(schema["type"], dt,
                                        ctx.options.draft)),
                 self._lift(obs))
        if "enum" in schema and "enum" not in handled_custom:
            emit(ctx.cid("enum"), self._lift(_lower_enum(schema["enum"], dt)),
                 self._lift(obs))
        if "const" in schema and "const" not in handled_custom:
            emit(ctx.cid("const"), self._lift(_json_eq(dt, schema["const"])),
                 self._lift(obs))
        for kw, op, strict_op in (
            ("minimum", "__ge__", "__gt__"),
            ("maximum", "__le__", "__lt__"),
            ("exclusiveMinimum", "__gt__", "__gt__"),
            ("exclusiveMaximum", "__lt__", "__lt__"),
        ):
            if kw in schema and kw not in handled_custom:
                v = schema[kw]
                if isinstance(v, bool):
                    # draft-4 boolean exclusive flag (folded into min/max)
                    if ctx.options.draft not in (None, 4):
                        raise SpecError(
                            f"boolean {kw} at {ctx.cid()} is the draft-4 "
                            f"form; draft {ctx.options.draft} expects a "
                            "number"
                        )
                    continue
                if kw.startswith("exclusive") and ctx.options.draft == 4:
                    raise SpecError(
                        f"numeric {kw} at {ctx.cid()} is a draft-6+ form; "
                        "draft 4 uses boolean exclusiveMinimum/Maximum "
                        "alongside minimum/maximum"
                    )
                # draft-4 legacy: boolean exclusiveMin/Max flips min/max to
                # strict (reference keywords/legacy/maximum_draft_4.rs)
                if kw == "minimum" and schema.get("exclusiveMinimum") is True:
                    op = strict_op
                if kw == "maximum" and schema.get("exclusiveMaximum") is True:
                    op = strict_op
                if _is_numeric(dt):
                    emit(ctx.cid(kw),
                         self._lift(_bound_pred(v, op, dt)),
                         self._lift(obs))
        if "multipleOf" in schema:
            emit(ctx.cid("multipleOf"),
                 self._lift(_lower_multiple_of(schema["multipleOf"], dt)),
                 self._lift(obs))

        # ---- string keywords --------------------------------------------
        if isinstance(dt, StringType):
            if "minLength" in schema:
                n = schema["minLength"]
                emit(ctx.cid("minLength"),
                     self._lift(lambda x, _n=n: F.length(x) >= _n),
                     self._lift(obs))
            if "maxLength" in schema:
                n = schema["maxLength"]
                emit(ctx.cid("maxLength"),
                     self._lift(lambda x, _n=n: F.length(x) <= _n),
                     self._lift(obs))
            if "pattern" in schema:
                pat = schema["pattern"]
                java = ecma_to_java(pat)
                if java is not None:
                    emit(ctx.cid("pattern"),
                         self._lift(lambda x, _j=java: x.rlike(_j)),
                         self._lift(obs))
                else:
                    # Java rejected it: Python-re fallback, else compile-time
                    # rejection (reference ``ecma.rs`` — never at runtime)
                    rx = python_fallback(pat)
                    if rx is None:
                        raise SpecError(
                            f"pattern {pat!r} at {ctx.cid()} compiles in "
                            "neither java.util.regex nor Python re"
                        )
                    py_fn = lambda v, _r=rx: _r.search(v) is not None
                    emit(ctx.cid("pattern"),
                         self._py_pred(ctx, py_fn, _pattern_udf(pat),
                                       "pattern"),
                         self._lift(obs))
                    out[-1].py_fn = py_fn
            if "format" in schema and ctx.options.validate_formats:
                from jsonschema_rs_spark.functions.formats import FORMATS_PY

                fmt = schema["format"]
                builder = ctx.options.custom_formats.get(fmt) or FORMATS.get(fmt)
                if builder is None:
                    if not ctx.options.ignore_unknown_formats:
                        raise SpecError(f"unknown format {fmt!r}")
                elif fmt in FORMATS_PY and fmt not in ctx.options.custom_formats:
                    emit(ctx.cid("format"),
                         self._py_pred(ctx, FORMATS_PY[fmt], builder,
                                       f"format {fmt!r}"),
                         self._lift(obs))
                    out[-1].py_fn = FORMATS_PY[fmt]
                else:
                    emit(ctx.cid("format"), self._lift(builder), self._lift(obs))
            # content keywords: built-in base64 / application/json (matching
            # the reference defaults, ``content_encoding.rs:10-30``) plus
            # registration hooks mirroring ``options.rs:137-258``; unknown
            # names are annotations (as in the reference).
            def _content_on(opt, name) -> bool:
                if isinstance(opt, bool):
                    return opt
                return name not in opt  # collection = removed names

            if ("contentEncoding" in schema and _content_on(
                    ctx.options.content_encoding_support,
                    schema["contentEncoding"])):
                enc = schema["contentEncoding"]
                builder = ctx.options.custom_encodings.get(enc) or (
                    (lambda x: F.try_to_binary(x, F.lit("base64")).isNotNull())
                    if enc == "base64" else None)
                if builder is not None:
                    emit(ctx.cid("contentEncoding"), self._lift(builder),
                         self._lift(obs))
            if ("contentMediaType" in schema and _content_on(
                    ctx.options.content_media_type_support,
                    schema["contentMediaType"])):
                mt = schema["contentMediaType"]
                builder = ctx.options.custom_media_types.get(mt) or (
                    (lambda x: self._json_parseable(x))
                    if mt == "application/json" else None)
                if builder is not None:
                    emit(ctx.cid("contentMediaType"), self._lift(builder),
                         self._lift(obs))

        # ---- object keywords --------------------------------------------
        if isinstance(dt, StructType):
            self._lower_struct(schema, ctx, out, valids)
        elif isinstance(dt, MapType):
            self._lower_map(schema, ctx, out, valids, emit)

        # ---- array keywords ----------------------------------------------
        if isinstance(dt, ArrayType):
            self._lower_array(schema, ctx, out, valids, emit)

        # ---- combinators --------------------------------------------------
        self._lower_logic(schema, ctx, out, valids)

        return _Lowered(out, _and(valids))

    # ------------------------------------------------------------------
    def _json_parseable(self, x: Column) -> Column:
        if hasattr(F, "try_parse_json"):
            return F.try_parse_json(x).isNotNull()
        return F.from_json(x, "map<string,string>").isNotNull() | x.rlike(
            r"^\s*(\[|\{|\"|-?\d|true|false|null)"
        )

    def _lift(self, fn: Callable[[Column], Column]) -> Callable[..., Column]:
        """Adapt a single-arg builder to the (x[, i]) calling convention."""
        return lambda x, *i, _fn=fn: _fn(x)

    def _mk(self, ctx: _Ctx, cid: str, pred, observed) -> CompiledConstraint:
        touched = None
        if ctx.scope == "element" and ctx.dpath:
            touched = frozenset({ctx.dpath[0]})
        # keywordLocation: the node's FULL pointer + the keyword segments
        # (everything in cid beyond the node's compact path)
        prefix = "/".join(ctx.path)
        rem = cid[len(prefix):].lstrip("/") if cid.startswith(prefix) else cid
        rem_segs = tuple(rem.split("/")) if rem else ()
        if rem_segs and rem_segs[0] in ("required", "dependentRequired"):
            rem_segs = rem_segs[:1]  # the keyword, not the key name
        sp = ctx.spointer if ctx.spointer is not None else ctx.path
        schema_path = "/" + "/".join(
            _esc_pointer(s) for s in (*sp, *rem_segs))
        return CompiledConstraint(
            constraint_id=cid, scope=ctx.scope, pred=pred, observed=observed,
            array=ctx.array, array_key=ctx.array_key, touched=touched,
            schema_path=schema_path, instance_fields=ctx.dpath,
        )

    # ------------------------------------------------------------------
    def _lower_struct(self, schema, ctx: _Ctx, out, valids) -> None:
        dt: StructType = ctx.dtype
        fields = {f.name: f.dataType for f in dt.fields}

        def descend(name: str, sub, extra_path: tuple[str, ...],
                    sp_extra: tuple[str, ...] | None = None):
            if name not in fields:
                if isinstance(sub, dict) and sub.get("$__lenient__"):
                    # dynamically-unrolled subtree past the typed nesting
                    # depth: the member can never exist, so every keyword
                    # except required passes trivially — emit nothing
                    return
                raise SpecError(
                    f"schema at {ctx.cid()} references field {name!r} not in the "
                    f"typed table schema (fields: {sorted(fields)})"
                )
            child_ctx = _Ctx(dtype=fields[name], path=ctx.path + extra_path,
                             scope=ctx.scope, dpath=ctx.dpath + (name,),
                             elementable=ctx.elementable,
                             array=ctx.array,
                             array_key=ctx.array_key,
                             spointer=_sp(ctx) + (
                                 sp_extra if sp_extra is not None
                                 else ("properties", name)),
                             stageable=ctx.stageable, options=ctx.options)
            lowered = self.lower(sub, child_ctx)

            def wrap(fn, _name=name):
                def wrapped(x, *i, _fn=fn):
                    fx = x.getField(_name)
                    return _fn(fx, *i)
                return wrapped

            def wrap_pass(fn, _name=name):
                def wrapped(x, *i, _fn=fn):
                    fx = x.getField(_name)
                    return fx.isNull() | _fn(fx, *i)
                return wrapped

            for c in lowered.constraints:
                # Element-scope constraints carry an absolute array accessor
                # (built from the doc root at the `items` site) — leave them
                # untouched.  Same-scope constraints re-anchor through this
                # field with JSON absent≡pass semantics.
                c.pred = wrap_pass(c.pred) if c.scope == ctx.scope else c.pred
                c.observed = (
                    wrap(c.observed) if c.scope == ctx.scope else c.observed
                )
                if c.scope == ctx.scope and c.viol_positions is not None:
                    # absent field → null array → plans coalesce to empty
                    c.viol_positions = wrap(c.viol_positions)
                if c.scope == ctx.scope and c.unit_positions is not None:
                    c.unit_positions = wrap(c.unit_positions)
                out.append(c)
            valids.append(wrap_pass(lowered.valid))

        # properties — reference ``keywords/properties.rs:13-106``
        for name, sub in schema.get("properties", {}).items():
            descend(name, sub, (name,))

        # patternProperties on a typed struct: field names are static, so
        # the regex match resolves at compile time (reference
        # ``pattern_properties.rs`` does it per doc).  The driver-side
        # matcher prefers Python re and falls back to the JVM dialect for
        # Java-valid/Python-invalid patterns (named groups, \\p{L}).
        import re as _re
        for pat, sub in schema.get("patternProperties", {}).items():
            try:
                matches = driver_regex_matcher(pat)
            except ValueError as e:
                raise SpecError(str(e))
            for name in fields:
                if matches(name):
                    descend(name, sub, ("patternProperties", pat, name),
                            sp_extra=("patternProperties", pat))

        # required — reference ``keywords/required.rs:16-117`` (per-key
        # specialization ≡ one constraint per key here)
        for key in schema.get("required", []):
            if key not in fields:
                if schema.get("$__lenient__"):
                    # typed object exists but can never carry this member:
                    # required fails for every present instance (ancestor
                    # null-passes still apply when the object is absent)
                    pred = lambda x, *i: F.lit(False)
                    out.append(self._mk(ctx, ctx.cid("required", key), pred,
                                        lambda x, *i: F.lit("missing")))
                    valids.append(pred)
                    continue
                raise SpecError(
                    f"required key {key!r} at {ctx.cid()} not in typed schema"
                )
            pred = lambda x, *i, _k=key: x.getField(_k).isNotNull()
            observed = lambda x, *i: F.lit("missing")
            c_req = self._mk(ctx, ctx.cid("required", key), pred, observed)
            if ctx.scope == "element" and not ctx.dpath:
                c_req.touched = frozenset({key})
            out.append(c_req)
            valids.append(pred)

        # dependentRequired / dependencies(list form) — reference
        # ``keywords/dependencies.rs:204-227``
        deps = dict(schema.get("dependentRequired", {}))
        for k, v in schema.get("dependencies", {}).items():
            if isinstance(v, list):
                deps[k] = v
        for key, reqs in deps.items():
            def pred(x, *i, _k=key, _rs=tuple(reqs)):
                need = F.lit(True)
                for r in _rs:
                    need = need & x.getField(r).isNotNull()
                return x.getField(_k).isNull() | need
            out.append(self._mk(ctx, ctx.cid("dependentRequired", key), pred,
                                lambda x, *i: F.lit("missing")))
            valids.append(pred)

        # dependentSchemas / dependencies(schema form)
        dep_schemas = dict(schema.get("dependentSchemas", {}))
        for k, v in schema.get("dependencies", {}).items():
            if isinstance(v, (dict, bool)):
                dep_schemas[k] = v
        for key, sub in dep_schemas.items():
            lowered = self.lower(
                sub, _Ctx(dtype=dt, path=ctx.path + ("dependentSchemas", key),
                          scope=ctx.scope, dpath=ctx.dpath,
                          elementable=ctx.elementable, array=ctx.array,
                          array_key=ctx.array_key,
                          spointer=_sp(ctx) + ("dependentSchemas", key),
                          stageable=ctx.stageable, options=ctx.options))
            def pred(x, *i, _k=key, _v=lowered.valid):
                return x.getField(_k).isNull() | _v(x, *i)
            out.append(self._mk(ctx, ctx.cid("dependentSchemas", key), pred,
                                self._lift(_obs_str(dt))))
            valids.append(pred)

        # min/maxProperties on struct = count of non-null members
        def _nonnull_count(x: Column) -> Column:
            cnt = F.lit(0)
            for f_ in dt.fields:
                cnt = cnt + x.getField(f_.name).isNotNull().cast("int")
            return cnt
        if "minProperties" in schema:
            n = schema["minProperties"]
            pred = lambda x, *i, _n=n: _nonnull_count(x) >= _n
            out.append(self._mk(ctx, ctx.cid("minProperties"), pred,
                                lambda x, *i: _nonnull_count(x).cast("string")))
            valids.append(pred)
        if "maxProperties" in schema:
            n = schema["maxProperties"]
            pred = lambda x, *i, _n=n: _nonnull_count(x) <= _n
            out.append(self._mk(ctx, ctx.cid("maxProperties"), pred,
                                lambda x, *i: _nonnull_count(x).cast("string")))
            valids.append(pred)

        # propertyNames on a typed struct: static field-name check, gated on
        # member PRESENCE — JSON Schema applies the name schema only to
        # present members, and absent ≡ NULL under the typed convention
        # (reference ``keywords/property_names.rs`` iterates actual keys).
        if "propertyNames" in schema:
            sub = schema["propertyNames"]
            name_ctx = _Ctx(dtype=StringType(), path=ctx.path + ("propertyNames",),
                            scope=ctx.scope, elementable=False, array=ctx.array,
                            array_key=ctx.array_key,
                            spointer=_sp(ctx) + ("propertyNames",),
                            options=ctx.options)
            # compile the name schema, then evaluate it per static field name
            lowered = self.lower(sub, name_ctx)
            # static evaluation happens at plan time with lit() names; emit a
            # single constraint whose pred folds the per-name results.
            def pred(x, *i, _v=lowered.valid, _names=tuple(fields)):
                outp = F.lit(True)
                for nm in _names:
                    outp = outp & (
                        x.getField(nm).isNull()
                        | F.coalesce(_v(F.lit(nm)), F.lit(True))
                    )
                return outp
            def observed(x, *i, _v=lowered.valid, _names=tuple(fields)):
                # the present member names whose name-schema failed
                return F.concat_ws(",", *[
                    F.when(
                        x.getField(nm).isNotNull()
                        & ~F.coalesce(_v(F.lit(nm)), F.lit(True)),
                        F.lit(nm),
                    )
                    for nm in _names
                ])
            out.append(self._mk(ctx, ctx.cid("propertyNames"), pred, observed))
            valids.append(pred)

        # additionalProperties on a typed struct: applies to PRESENT fields
        # not matched by properties/patternProperties (reference
        # ``additional_properties.rs:79-864``).  A declared span table is
        # usually closed-world (every field named in properties → nothing
        # emitted), but when the typed struct carries extra fields the
        # keyword must gate them, presence-checked via non-NULL.
        ap = schema.get("additionalProperties")
        if isinstance(ap, (dict, bool)) and ap is not True:
            named = set(schema.get("properties", {}) or {})
            matchers = []
            for pat in (schema.get("patternProperties", {}) or {}):
                try:
                    matchers.append(driver_regex_matcher(pat))
                except ValueError as e:
                    raise SpecError(str(e))
            extra_fields = [nm for nm in fields
                            if nm not in named
                            and not any(m(nm) for m in matchers)]
            # structural comparison must ignore the $__abs__ provenance
            # marker resolve_refs stamps on $ref-inlined subtrees
            # (round-5 ADVICE low #5)
            ap_cmp = ({k: v for k, v in ap.items()
                       if k not in ("$__abs__", "$__lenient__")}
                      if isinstance(ap, dict) else ap)
            if ap is False or ap_cmp == {"not": {}}:
                for nm in extra_fields:
                    pred = lambda x, *i, _k=nm: x.getField(_k).isNull()
                    obs_f = _obs_str(fields[nm])
                    out.append(self._mk(
                        ctx, ctx.cid("additionalProperties", nm), pred,
                        lambda x, *i, _k=nm, _o=obs_f: _o(x.getField(_k))))
                    valids.append(pred)
            else:
                for nm in extra_fields:
                    descend(nm, ap, ("additionalProperties", nm),
                            sp_extra=("additionalProperties",))

        # unevaluatedProperties — CONDITIONAL claim resolution on a typed
        # struct: field names are known at compile time, and claims made
        # inside branch applicators (if/then/else, anyOf, oneOf,
        # dependentSchemas) are gated on the branch's own runtime validity —
        # the columnar equivalent of the reference's runtime annotation
        # tracking (``unevaluated_properties.rs:41-752``): annotations count
        # only from schemas that were successfully applied.
        if isinstance(schema.get("unevaluatedProperties"), (dict, bool)):
            sub = schema["unevaluatedProperties"]
            claims = self._claimed_props_cond(schema, ctx)
            for fname in fields:
                conds = []
                any_hard = False
                unconditional = False
                for cond, names, matchers, claims_all, soft in claims:
                    hit = claims_all or fname in names or any(
                        m(fname) for m in matchers)
                    if not hit:
                        continue
                    if cond is None:
                        unconditional = True
                        break
                    conds.append(cond)
                    any_hard = any_hard or not soft
                if unconditional:
                    continue
                mark_out, mark_val = len(out), len(valids)
                descend(fname, sub, ("unevaluatedProperties", fname),
                        sp_extra=("unevaluatedProperties",))
                if not conds:
                    continue
                if any(c.scope != ctx.scope for c in out[mark_out:]):
                    # cross-scope (element) constraints can't see the node
                    # instance the claim conditions evaluate on
                    if not any_hard:
                        # only SOFT validity gates (round 5): fall back to
                        # the unconditional claim — drop the unevaluated
                        # check for this field (documented approximation)
                        del out[mark_out:]
                        del valids[mark_val:]
                        continue
                    raise SpecError(
                        f"unevaluatedProperties at {ctx.cid()}: field "
                        f"{fname!r} is claimed only conditionally but its "
                        "unevaluated schema produces nested-array element "
                        "constraints, which cannot be gated on the claim "
                        "condition; claim it unconditionally or simplify "
                        "the unevaluated schema"
                    )
                # field claimed only conditionally: the unevaluated check
                # applies exactly when NO claimant branch applied
                def claimed(x, *i, _cs=tuple(conds)):
                    o = F.lit(False)
                    for cf in _cs:
                        o = o | F.coalesce(cf(x, *i), F.lit(False))
                    return o
                for c in out[mark_out:]:
                    if c.scope == ctx.scope:
                        prev = c.pred
                        c.pred = (lambda x, *i, _p=prev, _cl=claimed:
                                  _cl(x, *i)
                                  | F.coalesce(_p(x, *i), F.lit(True)))
                for vi in range(mark_val, len(valids)):
                    prev_v = valids[vi]
                    valids[vi] = (lambda x, *i, _p=prev_v, _cl=claimed:
                                  _cl(x, *i)
                                  | F.coalesce(_p(x, *i), F.lit(True)))

    # ------------------------------------------------------------------
    def _claimed_props_cond(self, schema, ctx: _Ctx):
        """Claim sources for unevaluatedProperties on a typed struct.

        Returns a list of ``(cond, names, matchers, claims_all)`` where
        ``cond`` is a validity fn over the NODE instance (None =
        unconditional): claims made inside if/then/else, anyOf, oneOf, and
        dependentSchemas count only when that branch actually APPLIED —
        mirroring the spec's "annotations from successfully applied schemas"
        rule that the reference tracks at runtime.  ``not`` claims nothing
        (its success means the subschema failed)."""

        def and_(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return lambda x, *i: (F.coalesce(a(x, *i), F.lit(False))
                                  & F.coalesce(b(x, *i), F.lit(False)))

        def bvalid(s, suffix):
            return self.lower(s, _Ctx(
                dtype=ctx.dtype, path=ctx.path + suffix, scope=ctx.scope,
                dpath=ctx.dpath, elementable=False, array=ctx.array,
                array_key=ctx.array_key, spointer=_sp(ctx) + suffix,
                stageable=ctx.stageable, options=ctx.options)).valid

        out: list = []

        def walk(s, cond, suffix, pregated):
            """``pregated`` — cond already embeds this schema object's OWN
            validity (branch sources), so no extra claim gate is needed.
            The node itself and allOf children are NOT pregated: their
            claims gate on their claim-keyword validity (round 5 —
            annotations only from successful subschemas, output.rs:
            139-164); such gates are SOFT (the consumer may fall back to
            an unconditional claim where gating is inexpressible)."""
            if not isinstance(s, dict):
                return
            names = set(s.get("properties", {}) or {})
            pats = list(s.get("patternProperties", {}) or {})
            claims_all = isinstance(
                s.get("additionalProperties"), (dict, bool)
            ) or (s is not schema and isinstance(
                s.get("unevaluatedProperties"), (dict, bool)))
            if names or pats or claims_all:
                matchers = [driver_regex_matcher(p) for p in pats]
                g, soft = cond, False
                if not pregated:
                    subset = _prop_claim_subset(s)
                    if subset is not None:
                        g = and_(cond, bvalid(subset, suffix))
                        soft = True
                out.append((g, names, matchers, claims_all, soft))
            for idx, sub in enumerate(s.get("allOf", []) or []):
                walk(sub, cond, suffix + ("allOf", str(idx)), False)
            if isinstance(s.get("if"), (dict, bool)):
                cif = bvalid(s["if"], suffix + ("if",))
                walk(s["if"], and_(cond, cif), suffix + ("if",), True)
                # 2020-12: annotations only from subschemas that
                # SUCCESSFULLY validate — then/else claims gate on the
                # branch's own validity too (round 4)
                if isinstance(s.get("then"), (dict, bool)):
                    gthen = and_(and_(cond, cif),
                                 bvalid(s["then"], suffix + ("then",)))
                    walk(s["then"], gthen, suffix + ("then",), True)
                if isinstance(s.get("else"), (dict, bool)):
                    def nif(x, *i, _c=cif):
                        return ~F.coalesce(_c(x, *i), F.lit(False))
                    gelse = and_(cond, and_(
                        nif, bvalid(s["else"], suffix + ("else",))))
                    walk(s["else"], gelse, suffix + ("else",), True)
            for kw in ("anyOf", "oneOf"):
                for idx, sub in enumerate(s.get(kw, []) or []):
                    bsuf = suffix + (kw, str(idx))
                    walk(sub, and_(cond, bvalid(sub, bsuf)), bsuf, True)
            for k, sub in (s.get("dependentSchemas") or {}).items():
                def present(x, *i, _k=k):
                    return x.getField(_k).isNotNull()
                bsuf = suffix + ("dependentSchemas", k)
                walk(sub, and_(cond, and_(present, bvalid(sub, bsuf))),
                     bsuf, True)

        walk(schema, None, (), False)
        return out

    def _walk_branch_claims(self, schema, ctx: _Ctx, add,
                            dependent_schemas: bool = False) -> None:
        """Shared conditional-branch walker for runtime-gated claim
        resolution (unevaluatedItems / map unevaluatedProperties — the
        struct path has its own richer variant in ``_claimed_props_cond``):
        calls ``add(branch_schema, cond_fn)`` for if/then/else, anyOf and
        oneOf branches (and dependentSchemas when enabled, additionally
        gated on key presence).

        2020-12 grants annotations only from subschemas that SUCCESSFULLY
        validate, so then/else claims gate on the branch's own validity as
        well as the if-outcome (round 4; previously if-outcome only), and
        conditionals NESTED inside an applied branch recurse with the
        composed gate instead of counting unconditionally.  ``add``
        receives each branch's UNCONDITIONAL claims only (callers count
        with ``conditionals=False``); nesting is handled here."""

        def and_(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return lambda x, *i: (F.coalesce(a(x, *i), F.lit(False))
                                  & F.coalesce(b(x, *i), F.lit(False)))

        def bvalid(s, suffix):
            return self.lower(s, _Ctx(
                dtype=ctx.dtype, path=ctx.path + suffix, scope=ctx.scope,
                dpath=ctx.dpath, elementable=False, array=ctx.array,
                array_key=ctx.array_key, spointer=_sp(ctx) + suffix,
                stageable=False, options=ctx.options)).valid

        def walk(s, cond, suffix, branch_root):
            if not isinstance(s, dict):
                return
            if branch_root and s is not schema:
                add(s, cond)
            if isinstance(s.get("if"), (dict, bool)):
                cif = bvalid(s["if"], suffix + ("if",))
                gif = and_(cond, cif)
                walk(s["if"], gif, suffix + ("if",), True)
                if isinstance(s.get("then"), (dict, bool)):
                    gthen = and_(gif, bvalid(s["then"], suffix + ("then",)))
                    walk(s["then"], gthen, suffix + ("then",), True)
                if isinstance(s.get("else"), (dict, bool)):
                    def nif(x, *i, _c=cif):
                        return ~F.coalesce(_c(x, *i), F.lit(False))
                    gelse = and_(cond, and_(
                        nif, bvalid(s["else"], suffix + ("else",))))
                    walk(s["else"], gelse, suffix + ("else",), True)
            for kw in ("anyOf", "oneOf"):
                for idx, sub in enumerate(s.get(kw, []) or []):
                    bsuf = suffix + (kw, str(idx))
                    walk(sub, and_(cond, bvalid(sub, bsuf)), bsuf, True)
            if dependent_schemas:
                for k, sub in (s.get("dependentSchemas") or {}).items():
                    def present(x, *i, _k=k):
                        return F.map_contains_key(x, F.lit(_k))
                    bsuf = suffix + ("dependentSchemas", k)
                    walk(sub, and_(cond, and_(present, bvalid(sub, bsuf))),
                         bsuf, True)
            for idx, sub in enumerate(s.get("allOf", []) or []):
                # allOf children's direct claims are already inside the
                # parent's unconditional count — recurse for NESTED
                # conditionals only
                walk(sub, cond, suffix + ("allOf", str(idx)), False)

        walk(schema, None, (), False)

    def _claimed_items_cond(self, schema, ctx: _Ctx):
        """Conditional claim sources for unevaluatedItems on this ARRAY
        node: ``[(cond fn over the array instance, n_prefix, claims_all)]``
        — claims count only when the branch actually APPLIED (mirror of
        ``_claimed_props_cond`` / the reference's runtime annotation
        tracking, ``unevaluated_items.rs``)."""
        out: list = []

        def add(s, cond):
            # the branch's UNCONDITIONAL claims only — nested conditionals
            # recurse in _walk_branch_claims with composed gates
            nb, ab = _claimed_positions(s, conditionals=False)
            if nb or ab:
                out.append((cond, nb, ab))

        self._walk_branch_claims(schema, ctx, add)
        return out

    def _claimed_map_props_cond(self, schema, ctx: _Ctx):
        """Conditional claim sources for unevaluatedProperties on a MAP
        node: ``[(cond fn over the map instance, names, java patterns,
        claims_all)]`` — the map-typed mirror of ``_claimed_props_cond``
        (key matching stays Column-side with isin/rlike because map keys
        are dynamic)."""
        out: list = []

        def add(s, cond):
            nm, ps, allc = _claimed_props(s, conditionals=False)
            jps = []
            for p in ps:
                jp = ecma_to_java(p)
                if jp is None:
                    raise SpecError(
                        f"patternProperties key pattern {p!r} at {ctx.cid()} "
                        "is not expressible in the Java regex dialect"
                    )
                jps.append(jp)
            if nm or jps or allc:
                out.append((cond, tuple(nm), tuple(jps), allc))

        self._walk_branch_claims(schema, ctx, add, dependent_schemas=True)
        return out

    def _own_bvalid(self, s, ctx: _Ctx, suffix):
        return self.lower(s, _Ctx(
            dtype=ctx.dtype, path=ctx.path + suffix, scope=ctx.scope,
            dpath=ctx.dpath, elementable=False, array=ctx.array,
            array_key=ctx.array_key, spointer=_sp(ctx) + suffix,
            stageable=False, options=ctx.options)).valid

    def _own_prop_claim_sources(self, schema, ctx: _Ctx):
        """Node-own + allOf unevaluatedProperties claim sources WITH
        validity gates (round 5 — annotations only from successful
        subschemas, ``output.rs:139-164``): ``[(gate_or_None, names,
        java_pats, claims_all)]``.  gate None = the source's claim
        keywords cannot fail, so its claims stay on the static path."""
        out: list = []

        def walk(s, suffix):
            if not isinstance(s, dict):
                return
            names = set(s.get("properties", {}) or {})
            pats = list(s.get("patternProperties", {}) or {})
            allc = isinstance(s.get("additionalProperties"),
                              (dict, bool)) or (
                s is not schema and isinstance(
                    s.get("unevaluatedProperties"), (dict, bool)))
            if names or pats or allc:
                jps = []
                for p in pats:
                    jp = ecma_to_java(p)
                    if jp is None:
                        raise SpecError(
                            f"patternProperties key pattern {p!r} at "
                            f"{ctx.cid()} is not expressible in the Java "
                            "regex dialect")
                    jps.append(jp)
                subset = _prop_claim_subset(s)
                gate = (None if subset is None
                        else self._own_bvalid(subset, ctx, suffix))
                out.append((gate, tuple(names), tuple(jps), allc))
            for idx, sub in enumerate(s.get("allOf", []) or []):
                walk(sub, suffix + ("allOf", str(idx)))

        walk(schema, ())
        return out

    def _own_items_claim_sources(self, schema, ctx: _Ctx):
        """Node-own + allOf unevaluatedItems claim sources WITH validity
        gates (round 5): ``[(gate_or_None, n_prefix, claims_all)]``."""
        out: list = []

        def walk(s, suffix):
            if not isinstance(s, dict):
                return
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
            if nb or ab:
                subset = _items_claim_subset(s)
                gate = (None if subset is None
                        else self._own_bvalid(subset, ctx, suffix))
                out.append((gate, nb, ab))
            for idx, sub in enumerate(s.get("allOf", []) or []):
                walk(sub, suffix + ("allOf", str(idx)))

        walk(schema, ())
        return out

    # ------------------------------------------------------------------
    def _lower_map(self, schema, ctx: _Ctx, out, valids, emit) -> None:
        dt: MapType = ctx.dtype
        obs = _obs_str(dt)
        key_of = F.map_keys

        if "minProperties" in schema:
            n = schema["minProperties"]
            emit(ctx.cid("minProperties"),
                 self._lift(lambda x, _n=n: F.size(x) >= _n),
                 self._lift(lambda x: F.size(x).cast("string")))
        if "maxProperties" in schema:
            n = schema["maxProperties"]
            emit(ctx.cid("maxProperties"),
                 self._lift(lambda x, _n=n: F.size(x) <= _n),
                 self._lift(lambda x: F.size(x).cast("string")))
        if "required" in schema:
            for key in schema["required"]:
                emit(ctx.cid("required", key),
                     self._lift(lambda x, _k=key: F.map_contains_key(x, F.lit(_k))),
                     self._lift(lambda x: F.lit("missing")))

        # dependentRequired / dependencies(list form) on a map — reference
        # ``keywords/dependencies.rs:204-227`` over dynamic keys
        deps = dict(schema.get("dependentRequired", {}))
        for k, v in schema.get("dependencies", {}).items():
            if isinstance(v, list):
                deps[k] = v
        for key, reqs in deps.items():
            def dep_pred(x, *i, _k=key, _rs=tuple(reqs)):
                need = F.lit(True)
                for r in _rs:
                    need = need & F.map_contains_key(x, F.lit(r))
                return ~F.map_contains_key(x, F.lit(_k)) | need
            emit(ctx.cid("dependentRequired", key), dep_pred,
                 self._lift(lambda x: F.lit("missing")))

        # dependentSchemas / dependencies(schema form) on a map
        dep_schemas = dict(schema.get("dependentSchemas", {}))
        for k, v in schema.get("dependencies", {}).items():
            if isinstance(v, (dict, bool)):
                dep_schemas[k] = v
        for key, sub in dep_schemas.items():
            lowered = self.lower(
                sub, _Ctx(dtype=dt, path=ctx.path + ("dependentSchemas", key),
                          scope=ctx.scope, elementable=False, array=ctx.array,
                          array_key=ctx.array_key,
                          spointer=_sp(ctx) + ("dependentSchemas", key),
                          options=ctx.options))
            emit(ctx.cid("dependentSchemas", key),
                 self._lift(lambda x, _k=key, _v=lowered.valid:
                            ~F.map_contains_key(x, F.lit(_k))
                            | F.coalesce(_v(x), F.lit(True))),
                 self._lift(obs))

        # Map applicators evaluate value schemas inside F.forall lambdas —
        # python-backed leaves have no legal site there; reject at compile
        # time (clear SpecError instead of a Spark AnalysisException).
        # (``properties`` on a map uses plain element_at — no lambda — so
        # doc-scope python leaves are legal there; element scope is rejected
        # by _py_pred's stageable check.)
        for kw in ("propertyNames", "patternProperties",
                   "additionalProperties", "unevaluatedProperties"):
            subs = schema.get(kw)
            if kw == "patternProperties" and isinstance(subs, dict):
                subs = list(subs.values())  # dict-of-schemas
            else:
                subs = [subs]
            for s in subs:
                if isinstance(s, dict) and _needs_python(s, ctx.options):
                    raise SpecError(
                        f"python-backed check (format/pattern) under map "
                        f"{kw} at {ctx.cid()} is not supported — map values "
                        "are evaluated inside array lambdas"
                    )

        # propertyNames — reference ``keywords/property_names.rs``
        if "propertyNames" in schema:
            lowered = self.lower(
                schema["propertyNames"],
                _Ctx(dtype=StringType(), path=ctx.path + ("propertyNames",),
                     scope=ctx.scope, elementable=False, array=ctx.array,
                     array_key=ctx.array_key,
                     spointer=_sp(ctx) + ("propertyNames",),
                     options=ctx.options))
            emit(ctx.cid("propertyNames"),
                 self._lift(lambda x, _v=lowered.valid: F.forall(
                     key_of(x), lambda k: _v(k))),
                 self._lift(lambda x: F.to_json(key_of(x))))

        # properties on a map: apply subschema when the key is present
        for name, sub in schema.get("properties", {}).items():
            lowered = self.lower(
                sub, _Ctx(dtype=dt.valueType, path=ctx.path + (name,),
                          scope=ctx.scope, elementable=False, array=ctx.array,
                          array_key=ctx.array_key,
                          spointer=_sp(ctx) + ("properties", name),
                          options=ctx.options))
            emit(ctx.cid(name),
                 self._lift(lambda x, _k=name, _v=lowered.valid:
                            ~F.map_contains_key(x, F.lit(_k))
                            | _v(F.element_at(x, F.lit(_k)))),
                 self._lift(lambda x, _k=name:
                            F.element_at(x, F.lit(_k)).cast("string")))

        # patternProperties — reference ``keywords/pattern_properties.rs``
        pat_pairs = []
        for pat, sub in schema.get("patternProperties", {}).items():
            java = ecma_to_java(pat)
            if java is None:
                raise SpecError(
                    f"patternProperties key pattern {pat!r} at {ctx.cid()} is "
                    "not expressible in the Java regex dialect (map keys are "
                    "matched with rlike inside lambdas — no Python fallback)"
                )
            lowered = self.lower(
                sub, _Ctx(dtype=dt.valueType,
                          path=ctx.path + ("patternProperties", pat),
                          scope=ctx.scope, elementable=False, array=ctx.array,
                          array_key=ctx.array_key,
                          spointer=_sp(ctx) + ("patternProperties", pat),
                          options=ctx.options))
            pat_pairs.append((java, lowered.valid))
            emit(ctx.cid("patternProperties", pat),
                 self._lift(lambda x, _p=java, _v=lowered.valid: F.forall(
                     F.map_entries(x),
                     lambda e: ~e.getField("key").rlike(_p)
                     | _v(e.getField("value")))),
                 self._lift(obs))

        # additionalProperties — reference 8 fused variants
        # (``additional_properties.rs:79-864``); here a single forall whose
        # claim-set folds properties + patternProperties.
        # unevaluatedProperties on a map lowers the same way but with the
        # claim-set resolved statically across in-place applicators.
        ap_kw = None
        map_conds: list = []
        if "additionalProperties" in schema:
            ap_kw = "additionalProperties"
            named = tuple(schema.get("properties", {}))
            pats = tuple(p for p, _ in pat_pairs)
        elif isinstance(schema.get("unevaluatedProperties"), (dict, bool)):
            ap_kw = "unevaluatedProperties"
            a_names, a_pats, all_all = _claimed_props(schema)
            c_names, c_pats, all_st = _claimed_props(schema,
                                                     conditionals=False)
            # round 5: node-own/allOf claims gate on their claim-keyword
            # validity too (annotations only from successful subschemas);
            # sources whose claim keywords cannot fail stay static
            own = self._own_prop_claim_sources(schema, ctx)
            if any(al for g, _, _, al in own if g is None):
                ap_kw = None  # unconditionally all claimed
                named, pats = (), ()
            else:
                named = tuple(n for g, ns, _, _ in own if g is None
                              for n in ns)
                pats = tuple(p for g, _, ps, _ in own if g is None
                             for p in ps)
                map_conds = [(g, ns, ps, al) for g, ns, ps, al in own
                             if g is not None]
                if (set(a_names), sorted(a_pats), all_all) != (
                        set(c_names), sorted(c_pats), all_st):
                    # conditional branch sources: gate at runtime (round 3)
                    map_conds += self._claimed_map_props_cond(schema, ctx)
        if ap_kw is not None:
            ap = schema[ap_kw]

            def claimed_by(b, k: Column) -> Column:
                """b = the bound per-row branch-validity struct (None when
                there are no conditional sources)."""
                c = F.lit(False)
                if named:
                    c = c | k.isin(*named)
                for p in pats:
                    c = c | k.rlike(p)
                for j, (_cond, nm_j, ps_j, all_j) in enumerate(map_conds):
                    cj = F.lit(all_j)
                    if nm_j:
                        cj = cj | k.isin(*nm_j)
                    for p in ps_j:
                        cj = cj | k.rlike(p)
                    c = c | (b.getField(f"c{j}") & cj)
                return c

            def with_conds(x: Column, inner) -> Column:
                """Evaluate every branch-validity cond ONCE per row and bind
                the results as a lambda variable (single-element transform),
                so the per-key lambda reads booleans instead of re-running
                whole-map branch validation per key (interpreted HOF path)."""
                if not map_conds:
                    return inner(F.struct(F.lit(False).alias("c_")))
                cs = F.struct(*[
                    F.coalesce(c(x), F.lit(False)).alias(f"c{j}")
                    for j, (c, _, _, _) in enumerate(map_conds)
                ])
                return F.element_at(F.transform(F.array(cs), inner), 1)

            if ap is False:
                emit(ctx.cid(ap_kw),
                     self._lift(lambda x: with_conds(x, lambda b: F.forall(
                         key_of(x), lambda k: claimed_by(b, k)))),
                     self._lift(lambda x: with_conds(x, lambda b: F.to_json(
                         F.filter(key_of(x),
                                  lambda k: ~claimed_by(b, k))))))
            elif isinstance(ap, dict) and ap:
                lowered = self.lower(
                    ap, _Ctx(dtype=dt.valueType,
                             path=ctx.path + (ap_kw,),
                             scope=ctx.scope, elementable=False, array=ctx.array,
                             array_key=ctx.array_key,
                             spointer=_sp(ctx) + (ap_kw,),
                             options=ctx.options))
                emit(ctx.cid(ap_kw),
                     self._lift(lambda x, _v=lowered.valid: with_conds(
                         x, lambda b: F.forall(
                             F.map_entries(x),
                             lambda e: claimed_by(b, e.getField("key"))
                             | _v(e.getField("value"))))),
                     self._lift(obs))

    # ------------------------------------------------------------------
    def _lower_array(self, schema, ctx: _Ctx, out, valids, emit) -> None:
        dt: ArrayType = ctx.dtype
        elem_dt = dt.elementType
        obs = _obs_str(dt)

        if "minItems" in schema:
            n = schema["minItems"]
            emit(ctx.cid("minItems"),
                 self._lift(lambda x, _n=n: F.size(x) >= _n),
                 self._lift(lambda x: F.size(x).cast("string")))
        if "maxItems" in schema:
            n = schema["maxItems"]
            emit(ctx.cid("maxItems"),
                 self._lift(lambda x, _n=n: F.size(x) <= _n),
                 self._lift(lambda x: F.size(x).cast("string")))
        if "uniqueItems" in schema and schema["uniqueItems"] is True:
            # reference ``unique_items.rs:66-97`` adaptive pairwise/hash;
            # array_distinct is the set-oriented equivalent (typed columns
            # make 1==1.0 collisions impossible by construction).
            emit(ctx.cid("uniqueItems"),
                 self._lift(lambda x: F.size(x) == F.size(F.array_distinct(x))),
                 self._lift(lambda x: (
                     F.size(x) - F.size(F.array_distinct(x))).cast("string")))

        # contains / minContains / maxContains — reference
        # ``keywords/contains.rs:339-375`` fused variants
        if "contains" in schema:
            if _needs_python(schema["contains"], ctx.options):
                raise SpecError(
                    f"python-backed check (format/pattern) under contains at "
                    f"{ctx.cid()} is not supported — contains counts matches "
                    "inside an array lambda"
                )
            sub_l = self._lower_element_valid(schema["contains"], elem_dt, ctx,
                                              ("contains",))
            min_c = schema.get("minContains", 1)
            max_c = schema.get("maxContains")
            def count(x: Column, _v=sub_l) -> Column:
                return F.size(F.filter(x, lambda e: F.coalesce(_v(e), F.lit(False))))
            if min_c > 0:
                emit(ctx.cid("contains" if min_c == 1 and "minContains" not in schema
                             else "minContains"),
                     self._lift(lambda x, _n=min_c: count(x) >= _n),
                     self._lift(lambda x: count(x).cast("string")))
            if max_c is not None:
                emit(ctx.cid("maxContains"),
                     self._lift(lambda x, _n=max_c: count(x) <= _n),
                     self._lift(lambda x: count(x).cast("string")))

        # tuple forms: prefixItems (2020-12) / items: [..] (draft 4-2019)
        draft = ctx.options.draft
        tuple_schemas = None
        if isinstance(schema.get("prefixItems"), list):
            if draft in (4, 6, 7, 2019):
                raise SpecError(
                    f"prefixItems at {ctx.cid()} is a 2020-12 keyword; "
                    f"draft {draft} uses the array form of items"
                )
            tuple_schemas = schema["prefixItems"]
            tail_kw = "items"
        elif isinstance(schema.get("items"), list):
            if draft == 2020:
                raise SpecError(
                    f"array-form items at {ctx.cid()} was removed in "
                    "2020-12; use prefixItems"
                )
            tuple_schemas = schema["items"]
            tail_kw = "additionalItems"
        if tuple_schemas is not None:
            for p, sub in enumerate(tuple_schemas):
                self._emit_items(sub, ctx, elem_dt, out, valids,
                                 path_suffix=("prefixItems", str(p)),
                                 index_gate=("eq", p))
            tail = schema.get(tail_kw)
            if isinstance(tail, (dict, bool)) and tail is not True:
                self._emit_items(tail, ctx, elem_dt, out, valids,
                                 path_suffix=(tail_kw,),
                                 index_gate=("ge", len(tuple_schemas)))
        elif isinstance(schema.get("items"), (dict, bool)) and schema["items"] is not True:
            # object-form items — reference ``keywords/items.rs:186-206``
            self._emit_items(schema["items"], ctx, elem_dt, out, valids,
                             path_suffix=("items",), index_gate=None)

        # unevaluatedItems (reference tracks evaluated positions via runtime
        # annotations, ``unevaluated_items.rs``).  Unconditional claim
        # sources (the node itself + allOf) resolve statically; claims from
        # CONDITIONAL branches (if/then/else, anyOf, oneOf) gate on runtime
        # branch validity — an element position counts as evaluated only
        # when the branch that claims it actually applied, mirroring
        # ``_claimed_props_cond``.  The conditional path is one node-level
        # HOF check (rare corner; per-position attribution is kept on the
        # common static path).
        if isinstance(schema.get("unevaluatedItems"), (dict, bool)):
            n_all, all_all = _claimed_positions(schema)
            n_st, all_st = _claimed_positions(schema, conditionals=False)
            # 2020-12: `contains` claims the items it MATCHES — an
            # element-level runtime claim, handled on the gated path
            has_contains = isinstance(schema.get("contains"), (dict, bool))
            # round 5: node-own/allOf claims gate on their claim-keyword
            # validity (annotations only from successful subschemas);
            # can't-fail sources stay on the static per-position path
            own = self._own_items_claim_sources(schema, ctx)
            static_all = any(ab for g, _, ab in own if g is None)
            n_static = max([nb for g, nb, _ in own if g is None],
                           default=0)
            gated_own = [(g, nb, ab) for g, nb, ab in own
                         if g is not None]
            has_branch_conds = (n_all, all_all) != (n_st, all_st)
            if static_all:
                pass  # unconditionally all claimed: nothing unevaluated
            elif not gated_own and not has_branch_conds \
                    and not has_contains:
                # no conditional sources: static per-position attribution
                self._emit_items(
                    schema["unevaluatedItems"], ctx, elem_dt, out, valids,
                    path_suffix=("unevaluatedItems",),
                    index_gate=("ge", n_static) if n_static else None)
            else:
                # round-5 split: when the only runtime sources are gated
                # PREFIX claims (no branch conds, no contains, no gated
                # claims-all), positions past every potentially-claimed
                # prefix keep the rich static per-position attribution;
                # only the prefix window goes through the gated check
                gated_all = any(ab for _, _, ab in gated_own)
                upper = None
                if gated_own and not gated_all and not has_branch_conds \
                        and not has_contains:
                    upper = max([n_static] + [nb for _, nb, _ in
                                              gated_own])
                    self._emit_items(
                        schema["unevaluatedItems"], ctx, elem_dt, out,
                        valids, path_suffix=("unevaluatedItems",),
                        index_gate=("ge", upper))
                    conds = gated_own
                else:
                    conds = gated_own + (
                        self._claimed_items_cond(schema, ctx)
                        if has_branch_conds else [])
                n_st = n_static
                cont_ok = None
                if has_contains:
                    cont_ok = self._lower_element_valid(
                        schema["contains"], elem_dt, ctx, ("contains",))
                ue_ok = self._lower_element_valid(
                    schema["unevaluatedItems"], elem_dt, ctx,
                    ("unevaluatedItems",))

                def _bounds(x, _conds=conds, _n=n_st):
                    n_col = F.lit(_n)
                    all_col = F.lit(False)
                    for cond, nb, ab in _conds:
                        a = F.coalesce(cond(x), F.lit(False))
                        if ab:
                            all_col = all_col | a
                        elif nb:
                            n_col = F.greatest(
                                n_col,
                                F.when(a, F.lit(nb)).otherwise(F.lit(0)))
                    return n_col, all_col

                def _gated_cells(x, mk, _ok=ue_ok, _cont=cont_ok):
                    """One per-position value via ``mk(ok, e, i)`` under the
                    SHARED gated claim math — the node-level pred and the
                    per-position rows must never drift apart.

                    The branch-validity bounds bind ONCE as a lambda
                    variable (single-element transform — the word_shingles
                    trick): referencing ``_bounds(x)`` inside the
                    per-element lambda would re-validate every branch per
                    element in Spark's interpreted HOF path (O(n²)/row)."""
                    n_col, all_col = _bounds(x)
                    bound = F.struct(n_col.alias("n"), all_col.alias("a"))

                    def cell_ok(b, e, i):
                        claimed = b.getField("a") | (i < b.getField("n"))
                        if upper is not None:
                            # positions >= upper are handled by the static
                            # per-position check above (round-5 split)
                            claimed = claimed | (i >= F.lit(upper))
                        if _cont is not None:  # contains-matched items
                            claimed = claimed | F.coalesce(
                                _cont(e), F.lit(False))
                        return claimed | F.coalesce(_ok(e), F.lit(True))

                    return F.element_at(
                        F.transform(
                            F.array(bound),
                            lambda b: F.transform(
                                x, lambda e, i: mk(cell_ok(b, e, i), e, i)),
                        ),
                        1,
                    )

                def _cells(x):
                    return _gated_cells(x, lambda ok, e, i: ok)

                emit(ctx.cid("unevaluatedItems"),
                     self._lift(lambda x: F.coalesce(
                         F.forall(_cells(x), lambda b: b), F.lit(True))),
                     self._lift(lambda x: F.size(
                         F.filter(_cells(x), lambda b: ~b)).cast("string")))

                # per-position violation rows (round 4): same gated cell
                # math, emitting (pos, observed) structs for FAILING
                # positions instead of one node-level count row
                obs_e = _obs_str(elem_dt)

                def _pos_structs(x, _obs=obs_e):
                    structs = _gated_cells(
                        x,
                        lambda ok, e, i: F.when(
                            ~ok,
                            F.struct(
                                i.cast("int").alias("pos"),
                                _obs(e).cast("string").alias("obs"),
                            ),
                        ),
                    )
                    return F.filter(structs, lambda v: v.isNotNull())

                def _unit_structs(x, _obs=obs_e):
                    # BOTH-polarity per-position units (annotation stream)
                    return _gated_cells(
                        x,
                        lambda ok, e, i: F.struct(
                            i.cast("int").alias("pos"),
                            ok.alias("ok"),
                            _obs(e).cast("string").alias("obs"),
                        ),
                    )

                out[-1].viol_positions = self._lift(_pos_structs)
                out[-1].unit_positions = self._lift(_unit_structs)

    def _lower_element_valid(self, sub, elem_dt, ctx: _Ctx, suffix) -> Callable:
        lowered = self.lower(sub, _Ctx(
            dtype=elem_dt, path=ctx.path + suffix, scope=ctx.scope,
            elementable=False,
            array=ctx.array, array_key=ctx.array_key,
            spointer=_sp(ctx) + suffix, options=ctx.options))
        return lowered.valid

    def _emit_items(self, sub, ctx: _Ctx, elem_dt, out, valids,
                    path_suffix, index_gate) -> None:
        """Lower an element subschema.

        At doc scope over a doc-rooted array this produces *element-scope*
        constraints (per-element violation rows with span_index, evaluated
        inside one fused ``transform`` — the explode happens once, at
        violation-emission time only).  Deeper nesting collapses into a
        ``forall`` on the node's validity (no per-element attribution).
        """
        if ctx.scope == "doc" and ctx.elementable:
            # element scope: array accessor follows the pure field path
            # from the doc root (dpath), independent of combinator nesting
            arr_path = ctx.dpath
            elem_ctx = _Ctx(
                dtype=elem_dt, path=ctx.path + path_suffix, scope="element",
                array=self._array_accessor(arr_path), array_key=arr_path,
                spointer=_sp(ctx) + path_suffix,
                stageable=True, options=self.options)
            lowered = self.lower(sub, elem_ctx)
            for c in lowered.constraints:
                if index_gate is not None:
                    prev = c.pred
                    kind, n = index_gate
                    if kind == "eq":
                        c.pred = lambda x, i, _p=prev, _n=n: (i != _n) | _p(x, i)
                    else:
                        c.pred = lambda x, i, _p=prev, _n=n: (i < _n) | _p(x, i)
                    c.index_gate = index_gate
                out.append(c)
            # node-level validity for combinators / verdict fast path
            def arr_valid(x: Column, *_, _v=lowered.valid,
                          _gate=index_gate) -> Column:
                def body(e, i):
                    ok = F.coalesce(_v(e, i), F.lit(True))
                    if _gate is not None:
                        kind, n = _gate
                        gate_c = (i == n) if kind == "eq" else (i >= n)
                        ok = ~gate_c | ok
                    return ok
                return F.coalesce(
                    F.forall(F.transform(x, lambda e, i: body(e, i)),
                             lambda b: b),
                    F.lit(True))
            valids.append(arr_valid)
        else:
            # nested array inside an element: collapse to forall
            if _needs_python(sub, ctx.options):
                raise SpecError(
                    f"python-backed check (format/pattern) inside a nested "
                    f"array at {ctx.cid(*path_suffix)} is not supported — "
                    "the element predicate runs inside an array lambda with "
                    "no staged-column site; apply it on the outer span "
                    "array, or use a Column-expressible pattern/format"
                )
            lowered_valid = self._lower_element_valid(sub, elem_dt, ctx,
                                                      path_suffix)

            # the positional gate must survive the collapse: a prefixItems
            # subschema inside a combinator branch applies to ITS position
            # only, not every element (round-3 fix — the ungated forall made
            # anyOf-of-prefixItems branches reject valid arrays)
            def pred(x, *i, _v=lowered_valid, _gate=index_gate):
                def body(e, j):
                    ok = F.coalesce(_v(e), F.lit(True))
                    if _gate is not None:
                        kind, n = _gate
                        gate_c = (j == n) if kind == "eq" else (j >= n)
                        ok = ~gate_c | ok
                    return ok
                return F.coalesce(
                    F.forall(F.transform(x, body), lambda b: b),
                    F.lit(True))

            out.append(self._mk(ctx, ctx.cid(*path_suffix), pred,
                                self._lift(lambda x: F.size(x).cast("string"))))
            valids.append(pred)

    @staticmethod
    def _array_accessor(path: tuple[str, ...]) -> Callable[[Column], Column]:
        def acc(root: Column) -> Column:
            cur = root
            for seg in path:
                cur = cur.getField(seg)
            return cur
        return acc

    # ------------------------------------------------------------------
    def _lower_logic(self, schema, ctx: _Ctx, out, valids) -> None:
        # allOf — pass children through (reference ``all_of.rs:37``)
        for idx, sub in enumerate(schema.get("allOf", [])):
            lowered = self.lower(sub, _Ctx(
                dtype=ctx.dtype, path=ctx.path + ("allOf", str(idx)),
                scope=ctx.scope, dpath=ctx.dpath, elementable=ctx.elementable,
                array=ctx.array, array_key=ctx.array_key,
                spointer=_sp(ctx) + ("allOf", str(idx)),
                stageable=ctx.stageable, options=ctx.options))
            out.extend(lowered.constraints)
            valids.append(lowered.valid)

        obs = _obs_str(ctx.dtype)

        # anyOf — collapse to one constraint (reference ``any_of.rs:46``)
        if "anyOf" in schema:
            subs = [
                self.lower(s, _Ctx(dtype=ctx.dtype,
                                   path=ctx.path + ("anyOf", str(i)),
                                   scope=ctx.scope, dpath=ctx.dpath,
                                   elementable=False, array=ctx.array,
                                   array_key=ctx.array_key,
                                   spointer=_sp(ctx) + ("anyOf", str(i)),
                                   stageable=ctx.stageable,
                                   options=ctx.options)).valid
                for i, s in enumerate(schema["anyOf"])
            ]
            def pred(*a, _subs=tuple(subs)):
                outp = F.coalesce(_subs[0](*a), F.lit(False))
                for s in _subs[1:]:
                    outp = outp | F.coalesce(s(*a), F.lit(False))
                return outp
            out.append(self._mk(ctx, ctx.cid("anyOf"), pred, self._lift(obs)))
            valids.append(pred)

        # oneOf — exactly one (reference ``one_of.rs:43-69``)
        if "oneOf" in schema:
            subs = [
                self.lower(s, _Ctx(dtype=ctx.dtype,
                                   path=ctx.path + ("oneOf", str(i)),
                                   scope=ctx.scope, dpath=ctx.dpath,
                                   elementable=False, array=ctx.array,
                                   array_key=ctx.array_key,
                                   spointer=_sp(ctx) + ("oneOf", str(i)),
                                   stageable=ctx.stageable,
                                   options=ctx.options)).valid
                for i, s in enumerate(schema["oneOf"])
            ]
            def pred(*a, _subs=tuple(subs)):
                total = F.lit(0)
                for s in _subs:
                    total = total + F.coalesce(s(*a), F.lit(False)).cast("int")
                return total == 1
            out.append(self._mk(ctx, ctx.cid("oneOf"), pred, self._lift(obs)))
            valids.append(pred)

        # not — reference ``not.rs:28-45``
        if "not" in schema:
            sub_valid = self.lower(schema["not"], _Ctx(
                dtype=ctx.dtype, path=ctx.path + ("not",), scope=ctx.scope,
                dpath=ctx.dpath, elementable=False,
                array=ctx.array, array_key=ctx.array_key,
                spointer=_sp(ctx) + ("not",),
                stageable=ctx.stageable, options=ctx.options)).valid
            pred = lambda *a, _v=sub_valid: ~F.coalesce(_v(*a), F.lit(True))
            out.append(self._mk(ctx, ctx.cid("not"), pred, self._lift(obs)))
            valids.append(pred)

        # if/then/else — reference pre-fused variants ``if_.rs:183-202``.
        # Same-scope children keep per-constraint identity with a gated pred;
        # cross-scope children collapse into a node-level constraint.
        if "if" in schema and ("then" in schema or "else" in schema):
            cond_lowered = self.lower(schema["if"], _Ctx(
                dtype=ctx.dtype, path=ctx.path + ("if",), scope=ctx.scope,
                dpath=ctx.dpath, elementable=False,
                array=ctx.array, array_key=ctx.array_key,
                spointer=_sp(ctx) + ("if",),
                stageable=ctx.stageable, options=ctx.options))
            cond = cond_lowered.valid
            cond_touched = frozenset()
            for cc in cond_lowered.constraints:
                if cc.touched is None:
                    cond_touched = None
                    break
                cond_touched = cond_touched | cc.touched

            def gate(branch_schema, branch_name, polarity):
                lowered = self.lower(branch_schema, _Ctx(
                    dtype=ctx.dtype, path=ctx.path + (branch_name,),
                    scope=ctx.scope, dpath=ctx.dpath,
                    elementable=ctx.elementable,
                    array=ctx.array, array_key=ctx.array_key,
                    spointer=_sp(ctx) + (branch_name,),
                    stageable=ctx.stageable, options=ctx.options))
                same = all(c.scope == ctx.scope for c in lowered.constraints)
                def gated_c(cond_v, *a):
                    g = F.coalesce(cond_v, F.lit(False))
                    return g if polarity else ~g
                if same:
                    for c in lowered.constraints:
                        prev = c.pred
                        # the gated pred can't gate a per-position row
                        # builder — fall back to the node-level row
                        c.viol_positions = None
                        c.unit_positions = None
                        c.pred = (lambda *a, _p=prev:
                                  ~gated_c(cond(*a), *a) | F.coalesce(_p(*a), F.lit(True)))
                        # the gated pred now also reads the if-condition's
                        # fields
                        if c.touched is not None:
                            c.touched = (None if cond_touched is None
                                         else c.touched | cond_touched)
                        out.append(c)
                        valids.append(c.pred)
                else:
                    pred = (lambda *a, _v=lowered.valid:
                            ~gated_c(cond(*a), *a)
                            | F.coalesce(_v(*a), F.lit(True)))
                    out.append(self._mk(ctx, ctx.cid(branch_name), pred,
                                        self._lift(obs)))
                    valids.append(pred)

            if "then" in schema:
                gate(schema["then"], "then", True)
            if "else" in schema:
                gate(schema["else"], "else", False)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

_DRAFT_URIS = (
    ("draft-04", 4), ("draft-06", 6), ("draft-07", 7),
    ("2019-09", 2019), ("2020-12", 2020),
)


def _sniff_draft(schema: Any) -> int | None:
    """Map the root ``$schema`` URI to a draft (reference dispatch,
    ``options.rs:58-82`` / ``keywords/mod.rs:177-391``)."""
    if isinstance(schema, dict):
        uri = schema.get("$schema") or ""
        if not isinstance(uri, str):
            # fuzz-found (round 5): {"$schema": true} crashed the sniffer
            raise SpecError(f"$schema expects a URI string, got {uri!r}")
        for frag, d in _DRAFT_URIS:
            if frag in uri:
                return d
        if uri:
            raise SpecError(f"unrecognized $schema dialect {uri!r}")
    return None


def compile_spec(
    schema: Any,
    table_schema: StructType,
    options: EngineOptions | None = None,
) -> CompiledSpec:
    """Compile a constraint spec against a typed table schema.

    Mirrors the reference's ``build_validator`` pipeline
    (``compiler.rs:284-340``): detect draft → resolve refs → self-validate →
    lower keywords.
    """
    import dataclasses

    options = options or EngineOptions()
    draft = options.draft if options.draft is not None else _sniff_draft(schema)
    if draft not in (None, 4, 6, 7, 2019, 2020):
        raise SpecError(f"unsupported draft {draft!r}")
    validate_formats = options.validate_formats
    if validate_formats is None:
        # formats assert in drafts 4/6/7 (and the merged dialect); they are
        # annotation-only in 2019-09/2020-12 unless explicitly enabled
        validate_formats = draft in (None, 4, 6, 7)
    options = dataclasses.replace(
        options, draft=draft, validate_formats=validate_formats)
    # self-validate the RAW spec against the draft's meta-schema before
    # touching refs — the reference's compile-time gate (compiler.rs:246-282)
    from jsonschema_rs_spark.metaschema import validate_against_metaschema

    validate_against_metaschema(schema, draft)
    resolved = resolve_refs(schema, resources=options.resources or None,
                            recursion_limit=options.recursion_limit,
                            draft=draft)
    validate_spec(resolved, set(options.custom_keywords))
    lowerer = Lowerer(table_schema, options)
    lowered = lowerer.lower_root(resolved)
    return CompiledSpec(
        constraints=lowered.constraints,
        valid=lowered.valid,
        schema=resolved,
        table_schema=table_schema,
        py_stages=lowerer.stages,
    )

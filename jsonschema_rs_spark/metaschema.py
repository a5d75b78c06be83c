"""Meta-schema self-validation of constraint specs.

The reference validates every schema against its draft's meta-schema before
compiling (``crates/jsonschema/src/compiler.rs:246-282``, bundled meta-schema
documents under ``crates/jsonschema-referencing/metaschemas/``).  This module
is the driver-side analogue: per-draft meta-schemas expressed as plain dicts
(authored from the published json-schema.org draft documents — public spec
content, not reference code) plus a small structural checker that walks the
RAW spec before ``$ref`` resolution and raises ``SpecError`` with the JSON
Pointer of the offending location.

Runs once per job on the driver — nothing here touches an executor.
"""

from __future__ import annotations

import json
import re
from typing import Any

from jsonschema_rs_spark.spec import SpecError

_SIMPLE_TYPES = ["array", "boolean", "integer", "null", "number", "object",
                 "string"]

# a schema position: recurse into the whole meta-schema
_S = {"$ref": "#"}
_NONNEG = {"type": "integer", "minimum": 0}
_ANCHOR = {"type": "string",
           "pattern": r"^[A-Za-z_][-A-Za-z0-9._]*$"}


def _schema_array() -> dict:
    return {"type": "array", "minItems": 1, "items": _S}


def _string_array(min_items: int = 0) -> dict:
    out: dict = {"type": "array", "items": {"type": "string"},
                 "uniqueItems": True}
    if min_items:
        out["minItems"] = min_items
    return out


def _schema_map() -> dict:
    return {"type": "object", "additionalProperties": _S}


def metaschema(draft: int | None) -> dict:
    """The (single-document, consolidated) meta-schema for ``draft``.

    ``None`` is the permissive merged dialect: the union of every draft's
    keyword grammar, with both-form keywords (`exclusiveMinimum`, `items`,
    `dependencies`) accepting either shape.
    """
    sa = _schema_array()
    props: dict[str, Any] = {
        "$schema": {"type": "string"},
        "$comment": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "examples": {"type": "array"},
        "readOnly": {"type": "boolean"},
        "writeOnly": {"type": "boolean"},
        "type": {"anyOf": [
            {"enum": _SIMPLE_TYPES},
            {"type": "array", "items": {"enum": _SIMPLE_TYPES},
             "minItems": 1, "uniqueItems": True},
        ]},
        "enum": {"type": "array"},
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": "number"},
        "minimum": {"type": "number"},
        "maxLength": _NONNEG,
        "minLength": _NONNEG,
        "pattern": {"type": "string", "format": "regex"},
        "maxItems": _NONNEG,
        "minItems": _NONNEG,
        "uniqueItems": {"type": "boolean"},
        "maxProperties": _NONNEG,
        "minProperties": _NONNEG,
        "required": _string_array(1 if draft == 4 else 0),
        "properties": _schema_map(),
        "patternProperties": {"type": "object", "additionalProperties": _S,
                              "propertyNames": {"format": "regex"}},
        "additionalProperties": _S,
        "definitions": _schema_map(),
        "allOf": sa, "anyOf": sa, "oneOf": sa, "not": _S,
        "format": {"type": "string"},
    }
    if draft == 4:
        props["id"] = {"type": "string"}
        props["enum"] = {"type": "array", "minItems": 1, "uniqueItems": True}
        # draft-4 boolean exclusive flags (numeric is the draft-6+ form)
        bool_excl = {
            "type": "boolean",
            "$error": "expects a boolean under draft 4 (numeric exclusive "
                      "bounds are the draft-6+ form)"}
        props["exclusiveMaximum"] = bool_excl
        props["exclusiveMinimum"] = bool_excl
        props["items"] = {"anyOf": [_S, sa]}
        props["additionalItems"] = {"anyOf": [{"type": "boolean"}, _S]}
        props["dependencies"] = {
            "type": "object",
            "additionalProperties": {"anyOf": [_S, _string_array(1)]}}
        return {"type": ["object", "boolean"], "properties": props}

    # draft 6+ core
    props["$id"] = {"type": "string"}
    props["$ref"] = {"type": "string"}
    num_excl = {"type": "number"} if draft is not None else {
        "anyOf": [{"type": "number"}, {"type": "boolean"}],
        "$error": "expects a number (boolean is the draft-4 form)"}
    if draft is not None:
        num_excl = dict(num_excl)
        num_excl["$error"] = ("expects a number (boolean is the draft-4 "
                              "form)")
    props["exclusiveMaximum"] = num_excl
    props["exclusiveMinimum"] = num_excl
    props["const"] = True
    props["contains"] = _S
    props["propertyNames"] = _S
    props["dependencies"] = {
        "type": "object",
        "additionalProperties": {"anyOf": [_S, _string_array()]}}
    if draft in (6, 7):
        props["items"] = {"anyOf": [_S, sa]}
        props["additionalItems"] = _S
    if draft == 7 or draft is None:
        props["if"] = _S
        props["then"] = _S
        props["else"] = _S
        props["contentEncoding"] = {"type": "string"}
        props["contentMediaType"] = {"type": "string"}
    if draft in (2019, 2020) or draft is None:
        props["$defs"] = _schema_map()
        props["$anchor"] = _ANCHOR
        props["$vocabulary"] = {"type": "object"}
        props["dependentRequired"] = {
            "type": "object", "additionalProperties": _string_array()}
        props["dependentSchemas"] = _schema_map()
        props["unevaluatedItems"] = _S
        props["unevaluatedProperties"] = _S
        props["minContains"] = _NONNEG
        props["maxContains"] = _NONNEG
        props["deprecated"] = {"type": "boolean"}
        props["if"] = _S
        props["then"] = _S
        props["else"] = _S
        props["contentEncoding"] = {"type": "string"}
        props["contentMediaType"] = {"type": "string"}
    if draft == 2019:
        props["$recursiveRef"] = {"type": "string"}
        props["$recursiveAnchor"] = {"type": "boolean"}
        props["items"] = {"anyOf": [_S, sa]}
        props["additionalItems"] = _S
    if draft == 2020:
        props["$dynamicRef"] = {"type": "string"}
        props["$dynamicAnchor"] = _ANCHOR
        props["prefixItems"] = sa
        props["items"] = {
            **_S,
            "$error": "expects a single schema under 2020-12 (the array "
                      "form moved to prefixItems)"}
    if draft is None:  # merged dialect: every draft's spelling accepted
        props["id"] = {"type": "string"}
        props["$recursiveRef"] = {"type": "string"}
        props["$recursiveAnchor"] = {"type": "boolean"}
        props["$dynamicRef"] = {"type": "string"}
        props["$dynamicAnchor"] = _ANCHOR
        props["prefixItems"] = sa
        props["items"] = {"anyOf": [_S, sa]}
        props["additionalItems"] = {"anyOf": [{"type": "boolean"}, _S]}
    return {"type": ["object", "boolean"], "properties": props}


_METASCHEMAS: dict[Any, dict] = {}


def _type_ok(value: Any, t: str) -> bool:
    if t == "object":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "string":
        return isinstance(value, str)
    if t == "boolean":
        return isinstance(value, bool)
    if t == "integer":
        # JSON Schema (draft 6+): any number with a zero fractional part is
        # an integer — 1.0 satisfies "type": "integer" (the reference
        # accepts minLength: 1.0)
        if isinstance(value, bool):
            return False
        if isinstance(value, int):
            return True
        return isinstance(value, float) and value.is_integer()
    if t == "number":
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "null":
        return value is None
    return False


def _meta_errors(value: Any, ms: Any, root: dict, ptr: str,
                 errs: list[tuple[str, str]]) -> None:
    """Structural check of ``value`` (a spec fragment) against ``ms`` (a
    meta-schema fragment).  Supports exactly the constructs the bundled
    meta-schemas use; unknown spec keywords are annotations (reference
    ``compiler.rs:413-416``) because the meta-schema roots carry no
    ``additionalProperties`` restriction."""
    if ms is True:
        return
    if ms is False:
        errs.append((ptr, "schema is false"))
        return
    if "$ref" in ms:
        _meta_errors(value, root, root, ptr, errs)
        return

    custom = ms.get("$error")

    def fail(msg: str) -> None:
        errs.append((ptr, custom or msg))

    t = ms.get("type")
    if t is not None:
        wanted = t if isinstance(t, list) else [t]
        if not any(_type_ok(value, w) for w in wanted):
            fail(f"expects {' or '.join(wanted)}, got "
                 f"{json.dumps(value, default=str)[:80]}")
            return
    if "enum" in ms and value not in ms["enum"]:
        fail(f"{json.dumps(value, default=str)[:40]} is not one of "
             f"{ms['enum']}")
        return
    if "anyOf" in ms:
        failed: list[list] = []
        for alt in ms["anyOf"]:
            sub: list = []
            _meta_errors(value, alt, root, ptr, sub)
            if not sub:
                failed = []
                break
            failed.append(sub)
        if failed:
            if custom is not None:
                fail(custom)
                return
            # best-match: surface the alternative that got DEEPEST into the
            # value before failing (a bad enum nested under the schema form
            # should report its own pointer, not "matches no allowed form")
            best = max(failed, key=lambda s: len(s[0][0]))
            if len(best[0][0]) > len(ptr):
                errs.extend(best)
            else:
                fail("matches no allowed form")
            return
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in ms and value < ms["minimum"]:
            fail(f"must be >= {ms['minimum']}, got {value}")
        if "exclusiveMinimum" in ms and value <= ms["exclusiveMinimum"]:
            fail(f"must be > {ms['exclusiveMinimum']}, got {value}")
    if isinstance(value, str):
        if "pattern" in ms and not re.search(ms["pattern"], value):
            fail(f"{value!r} does not match {ms['pattern']!r}")
        if ms.get("format") == "regex":
            # the engine's dialect logic, not bare Python re: a Java-only
            # ECMA pattern like \p{L} is valid even though re rejects it
            from jsonschema_rs_spark.functions.ecma import (
                ecma_to_java,
                python_fallback,
            )

            if ecma_to_java(value) is None and python_fallback(value) is None:
                fail(f"{value!r} compiles in neither regex dialect "
                     "(Java/ECMA nor Python re)")
    if isinstance(value, list):
        if "minItems" in ms and len(value) < ms["minItems"]:
            fail(f"expects at least {ms['minItems']} item(s), got "
                 f"{len(value)}")
        if ms.get("uniqueItems") and len(
            {json.dumps(v, sort_keys=True, default=str) for v in value}
        ) != len(value):
            fail("items must be unique")
        if "items" in ms:
            for i, v in enumerate(value):
                _meta_errors(v, ms["items"], root, f"{ptr}/{i}", errs)
    if isinstance(value, dict):
        mprops = ms.get("properties", {})
        for name, v in value.items():
            esc = name.replace("~", "~0").replace("/", "~1")
            if "propertyNames" in ms:
                _meta_errors(name, ms["propertyNames"], root,
                             f"{ptr}/{esc}", errs)
            if name in mprops:
                sub: list = []
                _meta_errors(v, mprops[name], root, f"{ptr}/{esc}", sub)
                if (sub and isinstance(mprops[name], dict)
                        and "$error" in mprops[name]
                        and sub[0][0] == f"{ptr}/{esc}"):
                    # shape error on the keyword VALUE itself: the curated
                    # draft-gate message; deeper errors keep their pointer
                    errs.append((f"{ptr}/{esc}", mprops[name]["$error"]))
                else:
                    errs.extend(sub)
            elif "additionalProperties" in ms:
                _meta_errors(v, ms["additionalProperties"], root,
                             f"{ptr}/{esc}", errs)


def validate_against_metaschema(schema: Any, draft: int | None) -> None:
    """Raise ``SpecError`` (with a JSON Pointer) when the RAW spec violates
    its draft's meta-schema — the reference's compile-time self-validation
    (``compiler.rs:246-282,323-335``)."""
    if draft not in _METASCHEMAS:
        _METASCHEMAS[draft] = metaschema(draft)
    ms = _METASCHEMAS[draft]
    errs: list[tuple[str, str]] = []
    _meta_errors(schema, ms, ms, "", errs)
    if errs:
        ptr, msg = errs[0]
        label = "merged dialect" if draft is None else f"draft {draft}"
        more = f" (+{len(errs) - 1} more)" if len(errs) > 1 else ""
        kw = ptr.rsplit("/", 1)[-1] or "(root)"
        raise SpecError(
            f"spec violates the {label} meta-schema at {ptr or '/'}: "
            f"{kw} {msg}{more}")

"""Constraint-spec model: $ref resolution, self-validation, options.

Driver-side only — the analogue of the reference's compile front-end
(``crates/jsonschema/src/compiler.rs:284-340``: draft detection, registry
build, schema self-validation).  In a columnar engine nothing of this ever
reaches an executor: refs are inlined into a plain dict before lowering.

Recursive ``$ref`` (reference ``ref_.rs:82-155`` lazy thunks) has no columnar
analogue — Column trees are finite — so cycles are unrolled to a bounded depth
and rejected beyond it.
"""

from __future__ import annotations

import copy
import re
from typing import Any
from urllib.parse import unquote, urljoin

MAX_REF_DEPTH = 16

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _join(base: str, ref: str) -> str:
    """RFC 3986 reference resolution against the current base URI.

    ``urllib.parse.urljoin`` refuses non-hierarchical schemes (``urn:``),
    so absolute references short-circuit before it — the suite's
    referencing families only need relative resolution under http(s)
    bases (reference ``referencing/src/resolver.rs`` base-URI chain)."""
    if not base or _SCHEME_RE.match(ref):
        return ref
    return urljoin(base, ref)


class SpecError(ValueError):
    """Invalid constraint spec (analogue of reference meta-schema failure,
    ``compiler.rs:323-335``)."""


def _resource_id(s: dict, draft: int | None) -> str | None:
    """The non-fragment identifier that makes ``s`` a schema resource:
    ``$id`` (draft 6+), or legacy ``id`` under draft 4 / the merged
    dialect.  Fragment-only values are location-independent anchors, not
    resource boundaries."""
    sid = s.get("$id")
    if not isinstance(sid, str) and draft in (None, 4) \
            and isinstance(s.get("id"), str):
        sid = s.get("id")
    if isinstance(sid, str) and not sid.startswith("#"):
        return sid
    return None


def _find_anchor(doc: Any, name: str,
                 draft: int | None = None) -> Any | None:
    """Subschema carrying the location-independent identifier ``name``
    within ONE schema resource, draft-gated like the reference
    (``referencing/specification/mod.rs:85-90``): ``$anchor`` only under
    2019-09+, fragment-only ``$id: "#name"`` only under drafts 6/7, and
    fragment-only ``id`` only under draft 4; the merged dialect (draft
    None) accepts all three.  The walk stops at nested ``$id`` resources
    (their anchors belong to their own scope, reachable via their URI) and
    does NOT descend into ``enum``/``const`` DATA (an ``$anchor`` key
    inside an enum member is not an identifier)."""
    found = None
    use_anchor = draft in (None, 2019, 2020)
    use_id_frag = draft in (None, 6, 7)
    use_legacy = draft in (None, 4)

    def walk(s, at_root=False):
        nonlocal found
        if found is not None:
            return
        if isinstance(s, dict):
            if not at_root and _resource_id(s, draft) is not None:
                return  # nested resource boundary
            if ((use_anchor and s.get("$anchor") == name)
                    or (use_id_frag and s.get("$id") == "#" + name)
                    or (use_legacy and s.get("id") == "#" + name)):
                found = s
                return
            for k, v in s.items():
                if k in ("enum", "const"):
                    continue  # data, not schema structure
                walk(v)
        elif isinstance(s, list):
            for v in s:
                walk(v)

    walk(doc, at_root=True)
    return found


def _pointer_get(doc: Any, pointer: str,
                 resources: dict[str, Any] | None = None,
                 draft: int | None = None) -> Any:
    """Resolve a ``$ref`` against ``doc`` or a registered resource.

    ``#/...``       — local JSON Pointer.
    ``#name``       — plain-name fragment: ``$anchor`` (2019-09+) or a
                      fragment-only ``$id``/location-independent identifier
                      (drafts 6/7).
    ``uri``/``uri#/ptr``/``uri#name`` — looked up in ``resources`` (the
    analogue of the reference's URI-addressed registry,
    ``jsonschema-referencing/src/registry.rs:103-261``); resources are
    supplied up-front on the driver — there is no network retrieval on
    executors, ever.
    """
    if not pointer.startswith("#"):
        uri, _, frag = pointer.partition("#")
        if resources and uri in resources:
            return _pointer_get(resources[uri], "#" + frag, resources)
        raise SpecError(
            f"unresolvable $ref {pointer!r}: not a local '#/...' pointer and "
            f"no matching resource registered (have: {sorted(resources or [])}); "
            "fetch remote resources on the driver and pass them via "
            "resolve_refs(..., resources=...)"
        )
    frag = pointer[1:]
    if frag and not frag.startswith("/"):
        target = _find_anchor(doc, frag, draft)
        if target is None:
            raise SpecError(
                f"unresolvable $ref {pointer!r}: no $anchor or "
                f"fragment-only $id named {frag!r} in the schema resource")
        return target
    cur = doc
    for raw in pointer[1:].split("/"):
        if raw == "":
            continue
        # URI fragments are percent-decoded before JSON-Pointer token
        # unescaping (RFC 3986 + RFC 6901; upstream suite 'ref escapes':
        # '#/$defs/percent%25field')
        token = unquote(raw).replace("~1", "/").replace("~0", "~")
        if isinstance(cur, list):
            try:
                cur = cur[int(token)]
            except (ValueError, IndexError):
                raise SpecError(f"unresolvable $ref segment {token!r} in {pointer!r}")
        elif isinstance(cur, dict):
            if token not in cur:
                raise SpecError(f"unresolvable $ref {pointer!r} (missing {token!r})")
            cur = cur[token]
        else:
            raise SpecError(f"unresolvable $ref {pointer!r}")
    return cur


# sentinel key for "this resource's root" in a dynamic-scope anchor map —
# a tuple can never collide with a string anchor name
_SELF = ("self",)


def _collect_dynamic_anchors(root: Any) -> dict[Any, Any]:
    """``$dynamicAnchor`` name -> subschema for ONE schema resource.

    ``''`` maps to the resource root ONLY when the root carries
    ``$recursiveAnchor: true`` (2019-09: the dynamic substitution for
    ``$recursiveRef "#"`` applies only between anchored roots; without the
    anchor, ``$recursiveRef`` degrades to a plain ``$ref`` to the CURRENT
    resource root — tracked separately under the ``_SELF`` sentinel).

    Nested ``$id``-bearing subschemas are separate resources (their anchors
    belong to their own dynamic scope, entered via ``$ref``), so the walk
    stops at them."""
    out: dict[Any, Any] = {}

    def walk(s, at_root=False):
        if isinstance(s, dict):
            if not at_root and isinstance(s.get("$id"), str) \
                    and not s["$id"].startswith("#"):
                return  # a nested resource: its own scope, not ours
            if isinstance(s.get("$dynamicAnchor"), str):
                out.setdefault(s["$dynamicAnchor"], s)
            for k, v in s.items():
                if k in ("enum", "const"):
                    continue  # data, not schema structure
                walk(v)
        elif isinstance(s, list):
            for v in s:
                walk(v)

    walk(root, at_root=True)
    if isinstance(root, dict):
        if root.get("$recursiveAnchor") is True:
            out[""] = root
        out[_SELF] = root
    return out


def _pointer_resource(doc: Any, pointer: str, base: str = "",
                      draft: int | None = None) -> tuple[Any, str] | None:
    """The innermost ``$id``-carrying subschema a local ``#/...`` pointer
    path crosses (including the target itself) plus that resource's base
    URI (each crossed ``$id`` joined RFC-3986-style onto ``base``), or
    None.

    Entering a schema RESOURCE pushes its dynamic scope no matter how it was
    entered (reference ``ref_.rs`` dynamic-scope walk) — a local pointer
    ``#/$defs/inner`` into an embedded ``$id`` resource must resolve that
    resource's ``$dynamicAnchor``s exactly as entry via its URI would.
    A path that descends through ``enum``/``const`` is in DATA from that
    segment on; ``$id`` keys inside data are not resource boundaries."""
    if not pointer.startswith("#"):
        return None
    cur, found, in_data = doc, None, False
    prev = None
    _NAME_MAPS = ("properties", "patternProperties", "$defs", "definitions",
                  "dependentSchemas", "dependencies")
    for raw in pointer[1:].split("/"):
        if raw == "":
            continue
        token = unquote(raw).replace("~1", "/").replace("~0", "~")
        if isinstance(cur, list):
            try:
                cur = cur[int(token)]
            except (ValueError, IndexError):
                return None
        elif isinstance(cur, dict):
            if token not in cur:
                return None
            # a key named enum/const is DATA unless it is a property name
            # inside a name→schema container map
            if token in ("enum", "const") and prev not in _NAME_MAPS \
                    and not in_data:
                in_data = True
            cur = cur[token]
        else:
            return None
        prev = token
        if not in_data and isinstance(cur, dict):
            sid = _resource_id(cur, draft)
            if sid is not None:
                base = _join(base, sid)
                found = (cur, base)
    return found


def _collect_resources(doc: Any, base: str, out: dict[str, Any],
                       draft: int | None = None) -> None:
    """Register every embedded ``$id``-carrying subschema of ``doc`` under
    its ABSOLUTE URI (relative ``$id``s joined onto the enclosing
    resource's base, RFC 3986) — the registry analogue of the reference's
    ``referencing`` crate walking a document for embedded resources
    (``registry.rs:103-261``).  ``setdefault`` so explicitly supplied
    resources win over collected ones."""

    def walk(s, b, at_root=False):
        if isinstance(s, dict):
            sid = _resource_id(s, draft)
            nb = b
            if sid is not None:
                nb = _join(b, sid)
                if not at_root:
                    out.setdefault(nb, s)
            for k, v in s.items():
                if k in ("enum", "const"):
                    continue  # data, not schema structure
                walk(v, nb)
        elif isinstance(s, list):
            for v in s:
                walk(v, b)

    walk(doc, base, at_root=True)


def _dyn_lookup(scopes: tuple, name: str) -> Any | None:
    """Resolve a dynamic anchor across the dynamic scope: the OUTERMOST
    schema resource (earliest entered) defining the anchor wins — the
    reference's runtime dynamic-scope walk (``ref_.rs:82-155``), which is
    what lets e.g. strictTree override tree's ``node`` anchor.  Round 2
    used one first-lexical-match map over the root document only."""
    for scope in scopes:
        if name in scope:
            return scope[name]
    return None


def _mark_lenient(schema: Any) -> Any:
    """Tag every dict in a dynamically-unrolled subtree: the compiler then
    treats schema fields MISSING from the typed table as trivially-absent
    members (pass) instead of spec errors, which is how bounded unrolling
    terminates cleanly at the table's finite nesting depth."""
    _CONTAINERS = ("properties", "patternProperties", "dependentSchemas",
                   "$defs", "definitions")
    if isinstance(schema, dict):
        schema["$__lenient__"] = True
        for k, v in list(schema.items()):
            if k in ("enum", "const", "required", "$__lenient__"):
                continue
            if k in _CONTAINERS and isinstance(v, dict):
                # dict-of-schemas container: mark the VALUES, not the map
                for sub in v.values():
                    _mark_lenient(sub)
            else:
                _mark_lenient(v)
    elif isinstance(schema, list):
        for v in schema:
            _mark_lenient(v)
    return schema


def resolve_refs(schema: Any, root: Any | None = None, depth: int = 0,
                 resources: dict[str, Any] | None = None,
                 recursion_limit: int = 3,
                 _dyn: dict[str, Any] | None = None,
                 _dyn_depth: int = 0,
                 draft: int | None = None,
                 _res: Any = None,
                 _base: str = "") -> Any:
    """Inline every ``$ref`` (local or registered-resource) into a
    self-contained dict.

    Bounded unrolling replaces the reference's lazy cycle detection
    (``compiler.rs:182-197``): beyond MAX_REF_DEPTH we raise instead of
    building an infinite Column tree.

    ``$recursiveRef "#"`` / ``$dynamicRef "#name"`` (reference
    ``ref_.rs:82-155``, dynamic-scope thunks) are UNROLLED up to
    ``recursion_limit`` times, then terminate with the permissive ``true``
    schema.  Unrolled subtrees are marked lenient so descent past the typed
    table's finite nesting depth ends quietly — on a typed table a limit ≥
    the type's nesting depth makes the unrolling EXACT, because deeper
    instances cannot exist.
    """
    if root is None:
        root = schema
        reg: dict[str, Any] = {}
        if isinstance(schema, dict):
            rid = _resource_id(schema, draft)
            _base = rid if rid is not None else ""
            # the root document IS the current resource: its own $id is
            # already reflected in _base, so the generic-descent rebase
            # below must not re-join it (round 6, ADVICE)
            _res = schema
            if _base:
                reg[_base] = schema
            # every embedded $id subschema is an addressable resource
            # (round 5 — was root-level $defs only)
            _collect_resources(schema, _base, reg, draft)
            for uri, doc in (resources or {}).items():
                reg[uri] = doc  # explicit registration wins
                _collect_resources(doc, uri, reg, draft)
        resources = reg or None
        _dyn = (_collect_dynamic_anchors(schema),)
    if depth > MAX_REF_DEPTH:
        raise SpecError(
            f"$ref nesting deeper than {MAX_REF_DEPTH}: recursive schemas must be "
            "bounded for columnar compilation"
        )

    def rec(s, d=depth, dd=_dyn_depth, dyn=None, res=None, base=None):
        return resolve_refs(s, root, d, resources, recursion_limit,
                            dyn if dyn is not None else _dyn, dd, draft,
                            res if res is not None else _res,
                            base if base is not None else _base)

    def rec_kw(k, v):
        """Keyword-aware descent: the VALUES of name→schema container
        keywords are schemas but their KEYS are property names — a property
        literally named ``$ref`` (official suite: 'property named $ref that
        is not a reference') must not be interpreted as a reference."""
        if k in ("enum", "const"):
            return v
        if k in ("properties", "patternProperties", "$defs", "definitions",
                 "dependentSchemas") and isinstance(v, dict):
            return {name: rec(sub) for name, sub in v.items()}
        if k == "dependencies" and isinstance(v, dict):
            return {name: (rec(sub) if isinstance(sub, (dict, bool))
                           else sub)
                    for name, sub in v.items()}
        return rec(v)

    if isinstance(schema, dict):
        # Generic descent crossing into an embedded $id resource rebases
        # the current resource, base URI, and dynamic scope — plain-name
        # and '#/...' refs written INSIDE the resource must resolve there,
        # exactly as entry via $ref would (round-5 ADVICE: _res was only
        # threaded through $ref entry).
        sid = _resource_id(schema, draft)
        if sid is not None and schema is not _res and not (
                isinstance(_res, dict) and schema == _res):
            # Re-applying an already-joined $id must be skipped EXPLICITLY,
            # not by join idempotence: for directory-style ids
            # ("$id": "folder/") _join(base+folder/, folder/) yields
            # .../folder/folder/ and every relative ref inside the resource
            # then dangles (round 6, ADVICE high — suite refRemote
            # "base URI change - change folder").  Entry via $ref /
            # _pointer_resource hands the recursion a DEEPCOPY of the
            # resource, so identity alone can't detect it — the deep
            # equality against the current resource does.
            nb = _join(_base, sid)
            if nb != _base:
                _res, _base = schema, nb
                _dyn = (_dyn or ()) + (_collect_dynamic_anchors(schema),)
        if "$recursiveRef" in schema or "$dynamicRef" in schema:
            key = "$recursiveRef" if "$recursiveRef" in schema else "$dynamicRef"
            frag = schema[key]
            if not (isinstance(frag, str) and frag.startswith("#")):
                raise SpecError(f"{key} expects a '#...' fragment, got {frag!r}")
            name = frag[1:].lstrip("/")
            if key == "$recursiveRef" and name == "":
                # 2019-09: dynamic substitution only when the CURRENT
                # resource root is anchored; otherwise plain '#' to the
                # current resource root (NOT the outermost document)
                cur = (_dyn or ({},))[-1]
                if "" in cur:
                    anchor = _dyn_lookup(_dyn or (), "")
                else:
                    anchor = cur.get(_SELF)
            else:
                anchor = None
                if key == "$dynamicRef":
                    # 2020-12: the INITIAL resolution is ordinary $ref
                    # resolution in the CURRENT resource — a plain $anchor
                    # target (no $dynamicAnchor bookend) resolves
                    # statically; only a $dynamicAnchor target engages the
                    # dynamic-scope search
                    cur_res = _res if _res is not None else root
                    st = _find_anchor(cur_res, name, draft)
                    if st is not None and st.get("$dynamicAnchor") != name:
                        anchor = st
                if anchor is None:
                    anchor = _dyn_lookup(_dyn or (), name)
            if anchor is None:
                raise SpecError(
                    f"unresolvable {key} {frag!r}: no matching "
                    "$dynamicAnchor/$recursiveAnchor in the dynamic scope"
                )
            if _dyn_depth >= recursion_limit:
                return True  # bounded terminal: permissive past the limit
            target = _mark_lenient(copy.deepcopy(anchor))
            resolved = rec(target, depth + 1, _dyn_depth + 1)
            siblings = {k: v for k, v in schema.items() if k != key}
            extra = {
                k: rec_kw(k, v)
                for k, v in siblings.items()
                if k not in ("$defs", "definitions", "$id", "$schema",
                             "$recursiveAnchor", "$dynamicAnchor",
                             "$__lenient__")
            }
            if extra and isinstance(resolved, dict):
                wrapper = {"allOf": [resolved, extra]}
                if schema.get("$__lenient__"):
                    wrapper["$__lenient__"] = True
                return wrapper
            return resolved
        if "$ref" in schema:
            ref = schema["$ref"]
            if not isinstance(ref, str):
                # fuzz-found (round 5): a non-string $ref crashed the
                # resolver with AttributeError
                raise SpecError(f"$ref expects a URI-reference string, "
                                f"got {ref!r}")
            new_dyn = _dyn
            new_res, new_base = None, None
            cur_doc = _res if _res is not None else root
            if ref.startswith("#"):
                frag, frag_uri = ref[1:], _base
            else:
                # RFC 3986 join onto the current resource's base URI —
                # 'sibling.json' inside resource http://e/a.json means
                # http://e/sibling.json (suite refRemote "base URI change")
                full = _join(_base, ref)
                frag_uri, _, frag = full.partition("#")
                if frag_uri != _base or not _base:
                    if not (resources and frag_uri in resources):
                        raise SpecError(
                            f"unresolvable $ref {ref!r} (-> {full!r}): not "
                            "a local reference into the current resource "
                            "and no "
                            "matching resource registered (have: "
                            f"{sorted(resources or [])}); fetch remote "
                            "resources on the driver and pass them via "
                            "resolve_refs(..., resources=...)")
                    cur_doc = resources[frag_uri]
                    # entering another schema RESOURCE pushes its dynamic
                    # scope (innermost last; lookups scan outermost-first)
                    new_dyn = (_dyn or ()) + (
                        _collect_dynamic_anchors(cur_doc),)
                    new_res, new_base = cur_doc, frag_uri
            if frag and not frag.startswith("/"):
                # plain-name fragment: resolved in the target resource
                t = _find_anchor(cur_doc, frag, draft)
                if t is None:
                    raise SpecError(
                        f"unresolvable $ref {ref!r}: no location-"
                        f"independent identifier named {frag!r} in the "
                        "target schema resource")
                target = copy.deepcopy(t)
            else:
                target = copy.deepcopy(
                    _pointer_get(cur_doc, "#" + frag, resources, draft))
                # a pointer that descends into (or lands on) an embedded
                # $id subschema also enters that resource
                hit = _pointer_resource(cur_doc, "#" + frag,
                                        new_base if new_base is not None
                                        else _base, draft)
                if hit is not None:
                    new_dyn = (new_dyn or ()) + (
                        _collect_dynamic_anchors(hit[0]),)
                    new_res, new_base = hit
            resolved = rec(target, depth + 1, dyn=new_dyn, res=new_res,
                           base=new_base)
            if isinstance(resolved, dict):
                # absoluteKeywordLocation provenance (reference
                # ``output.rs:193-200,242-249``): the pre-inline resource
                # URI + pointer, so basic-output units can report where a
                # $ref-crossing keyword REALLY lives.  Innermost ref wins
                # (setdefault: an outer re-inline must not overwrite the
                # original provenance recorded on the subtree root).
                if ref.startswith("#"):
                    abs_loc = (_base or "") + "#" + frag
                else:
                    abs_loc = frag_uri + "#" + frag
                resolved.setdefault("$__abs__", abs_loc)
            # Sibling keywords next to $ref: drafts 4-7 IGNORE them ($ref
            # replaces the whole object, reference ``ref_.rs`` legacy
            # behavior / draft-7 spec §8.3); 2019-09+ (and the merged
            # dialect) evaluate them conjunctively.
            if draft in (4, 6, 7):
                return resolved
            siblings = {k: v for k, v in schema.items() if k != "$ref"}
            if siblings and isinstance(resolved, dict):
                merged = dict(resolved)
                extra = {
                    k: rec_kw(k, v)
                    for k, v in siblings.items()
                    if k not in ("$defs", "definitions", "$id", "$schema")
                }
                # sibling keywords combine conjunctively with the referenced schema
                if extra:
                    merged = {"allOf": [resolved, extra]}
                return merged
            return resolved
        return {k: rec_kw(k, v) for k, v in schema.items()}
    if isinstance(schema, list):
        return [rec(v) for v in schema]
    return schema


_KNOWN_KEYWORDS = {
    # §2.1 type & value
    "type", "enum", "const", "minimum", "maximum",
    "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
    # §2.2 string
    "minLength", "maxLength", "pattern", "format",
    "contentEncoding", "contentMediaType",
    # §2.3 object
    "properties", "required", "patternProperties", "additionalProperties",
    "propertyNames", "minProperties", "maxProperties",
    "dependencies", "dependentRequired", "dependentSchemas",
    # §2.4 array
    "items", "prefixItems", "additionalItems",
    "contains", "minContains", "maxContains",
    "minItems", "maxItems", "uniqueItems",
    # §2.5 logic
    "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
    # §2.6 refs / metadata (handled or ignored as annotations)
    "$ref", "$defs", "definitions", "$id", "$schema", "$comment",
    "$recursiveRef", "$recursiveAnchor", "$dynamicRef", "$dynamicAnchor",
    "title", "description", "default", "examples", "deprecated",
    "readOnly", "writeOnly", "$anchor", "$vocabulary", "$__lenient__",
}


def validate_spec(schema: Any, custom_keywords: set[str] = frozenset()) -> None:
    """Light meta-validation (reference validates schemas against the draft
    meta-schema, ``compiler.rs:246-282``).  Unknown keywords are annotations
    in the reference (``compiler.rs:413-416``); we warn-by-raising only for
    obviously malformed values, not unknown names."""
    if isinstance(schema, bool):
        return
    if not isinstance(schema, dict):
        raise SpecError(f"schema must be a dict or bool, got {type(schema).__name__}")
    for k, v in schema.items():
        if k in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
                 "multipleOf") and not isinstance(v, (int, float)):
            raise SpecError(f"{k} expects a number, got {v!r}")
        if k in ("minLength", "maxLength", "minItems", "maxItems",
                 "minProperties", "maxProperties", "minContains",
                 "maxContains") and not (
            isinstance(v, (int, float)) and not isinstance(v, bool)
            and float(v).is_integer() and v >= 0
        ):
            # integer-valued floats (1.0) are integers per draft 6+
            raise SpecError(f"{k} expects a non-negative integer, got {v!r}")
        if k == "pattern" and not isinstance(v, str):
            raise SpecError(f"pattern expects a string, got {v!r}")
        if k == "required" and not (
            isinstance(v, list) and all(isinstance(s, str) for s in v)
        ):
            raise SpecError(f"required expects a list of strings, got {v!r}")
        if k == "enum" and not isinstance(v, list):
            raise SpecError(f"enum expects a list, got {v!r}")
        if k in ("allOf", "anyOf", "oneOf") and not (
            isinstance(v, list) and len(v) >= 1
        ):
            raise SpecError(f"{k} expects a non-empty list of schemas, got {v!r}")
        if k in ("properties", "patternProperties", "dependentSchemas") and not isinstance(v, dict):
            raise SpecError(f"{k} expects an object, got {v!r}")
        # recurse into subschemas
        if k in ("properties", "patternProperties", "dependentSchemas", "$defs",
                 "definitions"):
            if isinstance(v, dict):
                for sub in v.values():
                    validate_spec(sub, custom_keywords)
        elif k in ("items", "additionalItems", "additionalProperties",
                   "propertyNames", "contains", "not", "if", "then", "else"):
            if isinstance(v, (dict, bool)):
                validate_spec(v, custom_keywords)
            elif isinstance(v, list):  # draft4-7 tuple `items`
                for sub in v:
                    validate_spec(sub, custom_keywords)
        elif k in ("allOf", "anyOf", "oneOf", "prefixItems"):
            if k == "prefixItems" and not isinstance(v, list):
                # fuzz-found (round 5): non-list prefixItems crashed the
                # recursion (allOf/anyOf/oneOf are list-checked above)
                raise SpecError(f"prefixItems expects a list, got {v!r}")
            for sub in v:
                validate_spec(sub, custom_keywords)


def strip_internal_markers(schema: Any) -> Any:
    """A deep copy of a RESOLVED schema without the engine's internal
    provenance keys (``$__abs__`` — absoluteKeywordLocation provenance,
    ``$__lenient__`` — bounded-unroll marker), for consumers that
    re-serialize or structurally compare ``CompiledSpec.schema``
    (round-5 ADVICE: the markers are an implementation detail of the
    resolved tree, not schema content)."""
    if isinstance(schema, dict):
        return {k: strip_internal_markers(v) for k, v in schema.items()
                if k not in ("$__abs__", "$__lenient__")}
    if isinstance(schema, list):
        return [strip_internal_markers(v) for v in schema]
    return schema

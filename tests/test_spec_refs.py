"""Round-5 reference-resolution semantics: base-URI threading through
generic descent, resource-relative pointers, draft-gated anchors, and
RFC 3986 relative-URI joins (reference ``referencing`` crate —
``resolver.rs`` base-URI chain, ``specification/mod.rs:85-90`` draft
gates).  Pure driver-side tests, no SparkSession."""

import pytest

from jsonschema_rs_spark.spec import SpecError, resolve_refs


def test_plain_fragment_in_descended_embedded_resource():
    """'#name' written INSIDE an embedded $id resource reached by plain
    descent (not via $ref) resolves in THAT resource, even when the root
    defines a same-named decoy (round-5 ADVICE medium #1)."""
    out = resolve_refs({
        "$defs": {"decoy": {"$anchor": "foo", "maximum": 0}},
        "properties": {"p": {
            "$id": "urn:inner",
            "$defs": {"A": {"$anchor": "foo", "minimum": 1}},
            "properties": {"q": {"$ref": "#foo"}},
        }},
    })
    q = out["properties"]["p"]["properties"]["q"]
    assert q.get("minimum") == 1 and "maximum" not in q, out

    # anchor existing ONLY in the embedded resource: resolvable (was
    # SpecError before _res rebasing on descent)
    out = resolve_refs({
        "properties": {"p": {
            "$id": "urn:inner2",
            "$defs": {"A": {"$anchor": "only", "minLength": 3}},
            "properties": {"q": {"$ref": "#only"}},
        }},
    })
    assert out["properties"]["p"]["properties"]["q"].get("minLength") == 3


def test_local_pointer_inside_external_resource_is_resource_relative():
    """'#/...' inside a registered resource resolves against the RESOURCE
    document, not the root document (round-5 ADVICE medium #2)."""
    ext = {"$defs": {"pos": {"minimum": 100}},
           "properties": {"x": {"$ref": "#/$defs/pos"}}}
    root = {"$defs": {"pos": {"minimum": -1}},  # same-named decoy
            "properties": {"p": {"$ref": "https://e.com/ext#/properties/x"}}}
    out = resolve_refs(root, resources={"https://e.com/ext": ext})
    assert out["properties"]["p"].get("minimum") == 100, out


def test_local_pointer_inside_descended_embedded_resource():
    """'#/...' inside an embedded $id resource entered by descent is also
    resource-relative (the anchor path and the pointer path must agree)."""
    out = resolve_refs({
        "$defs": {"pos": {"minimum": -1}},
        "properties": {"p": {
            "$id": "urn:emb",
            "$defs": {"pos": {"minimum": 100}},
            "properties": {"q": {"$ref": "#/$defs/pos"}},
        }},
    })
    assert out["properties"]["p"]["properties"]["q"].get("minimum") == 100


def test_dynamic_anchor_inside_enum_data_ignored():
    """$dynamicAnchor inside enum/const DATA is not an identifier
    (round-5 ADVICE low #3)."""
    with pytest.raises(SpecError, match="unresolvable"):
        resolve_refs({
            "$defs": {"x": {"enum": [{"$dynamicAnchor": "n"}]}},
            "properties": {"p": {"$dynamicRef": "#n"}},
        })


def test_anchor_draft_gating():
    """Reference gates location-independent identifiers per draft:
    $anchor 2019-09+ only, fragment $id drafts 6/7 only, fragment id
    draft 4 only (referencing/specification/mod.rs:85-90)."""
    anchor_schema = {
        "$defs": {"A": {"$anchor": "foo", "minimum": 10}},
        "properties": {"p": {"$ref": "#foo"}},
    }
    # $anchor honored under 2019/2020 (and merged None)
    for d in (2019, 2020, None):
        out = resolve_refs(anchor_schema, draft=d)
        assert out["properties"]["p"].get("minimum") == 10, d
    # ... but NOT under draft 7 ($id:"#foo" is the draft-7 spelling)
    with pytest.raises(SpecError, match="unresolvable"):
        resolve_refs(anchor_schema, draft=7)

    id_schema = {
        "definitions": {"A": {"$id": "#bar", "maxLength": 3}},
        "properties": {"p": {"$ref": "#bar"}},
    }
    for d in (6, 7, None):
        out = resolve_refs(id_schema, draft=d)
        assert out["properties"]["p"].get("maxLength") == 3, d
    with pytest.raises(SpecError, match="unresolvable"):
        resolve_refs(id_schema, draft=2020)

    legacy_schema = {
        "definitions": {"A": {"id": "#baz", "minLength": 2}},
        "properties": {"p": {"$ref": "#baz"}},
    }
    out = resolve_refs(legacy_schema, draft=4)
    assert out["properties"]["p"].get("minLength") == 2
    with pytest.raises(SpecError, match="unresolvable"):
        resolve_refs(legacy_schema, draft=7)


def test_relative_uri_ref_joins_onto_resource_base():
    """'sibling.json' inside resource http://e.com/a.json resolves to
    http://e.com/sibling.json (suite refRemote 'base URI change')."""
    a = {"$id": "http://e.com/a.json",
         "properties": {"x": {"$ref": "sibling.json"}}}
    sib = {"$id": "http://e.com/sibling.json", "minimum": 5}
    out = resolve_refs({"$ref": "http://e.com/a.json"},
                       resources={"http://e.com/a.json": a,
                                  "http://e.com/sibling.json": sib})
    assert out["properties"]["x"].get("minimum") == 5, out

    # same-document relative ref: 'a.json#/$defs/d' from inside a.json
    a2 = {"$id": "http://e.com/a.json",
          "$defs": {"d": {"maximum": 9}},
          "properties": {"x": {"$ref": "a.json#/$defs/d"}}}
    out = resolve_refs(a2, resources={})
    assert out["properties"]["x"].get("maximum") == 9, out


def test_embedded_resource_registered_anywhere():
    """$id subschemas ANYWHERE (not just root-level $defs) are
    URI-addressable, with relative $ids joined onto the enclosing base."""
    out = resolve_refs({
        "$id": "http://e.com/root.json",
        "properties": {
            "a": {"$id": "leaf.json", "minLength": 4},
            "b": {"$ref": "http://e.com/leaf.json"},
        },
    })
    assert out["properties"]["b"].get("minLength") == 4, out


def test_id_in_enum_data_not_a_resource():
    """A '$id' key inside enum data must not register a resource."""
    with pytest.raises(SpecError, match="unresolvable"):
        resolve_refs({
            "$defs": {"x": {"enum": [{"$id": "urn:fake", "minimum": 1}]}},
            "properties": {"p": {"$ref": "urn:fake"}},
        })


def test_strip_internal_markers():
    from jsonschema_rs_spark.spec import strip_internal_markers

    out = resolve_refs({
        "$defs": {"t": {"minLength": 4}},
        "properties": {"p": {"$ref": "#/$defs/t"}},
    })
    assert "$__abs__" in out["properties"]["p"]
    clean = strip_internal_markers(out)
    assert clean["properties"]["p"] == {"minLength": 4}
    assert out["properties"]["p"].get("$__abs__")  # original untouched


def test_directory_style_id_not_rejoined_on_entry():
    """Entering a resource whose $id is DIRECTORY-style ('folder/') via
    $ref must not re-apply the $id during the descent into the (copied)
    resource root: _join is not idempotent for directory ids, so the base
    became .../folder/folder/ and every relative ref inside dangled
    (round 6, ADVICE high — suite refRemote 'base URI change - change
    folder')."""
    root = {
        "$id": "http://localhost:1234/scope_change_defs1.json",
        "properties": {"list": {"$ref": "baseUriChangeFolder/"}},
        "$defs": {
            "baz": {
                "$id": "baseUriChangeFolder/",
                "type": "array",
                "items": {"$ref": "folderInteger.json"},
            },
        },
    }
    out = resolve_refs(root, resources={
        "http://localhost:1234/baseUriChangeFolder/folderInteger.json":
            {"type": "integer"},
    })
    items = out["properties"]["list"]["items"]
    assert items.get("type") == "integer", out

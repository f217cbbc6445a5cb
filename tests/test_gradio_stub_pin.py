"""Pin the gradio stub against API drift (VERDICT r3 task #8).

Real gradio is never installed in this environment (by design — CLAUDE.md),
so the Blocks assembly in ui/app.py only ever executes against
tests/gradio_stub.py. This test makes the stub's assumptions EXPLICIT: it
AST-scans ui/app.py for every `gr.<...>` attribute path and every event
method wired on a gradio component, and asserts the stub declares each one.
A future change to app.py that touches a gradio symbol the stub doesn't
implement now surfaces as a named failure here instead of a silently-stale
stub (reference UI surface: /root/reference/app.py:72-91).
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

import tests.gradio_stub as stub

APP_PATH = (Path(__file__).resolve().parent.parent
            / "diffusynth_tpu" / "ui" / "app.py")

# Event/lifecycle methods app.py may call on gradio OBJECTS (components /
# Blocks). AST can't always type the receiver, so any `.name(...)` call in
# app.py whose name appears in this table must exist on the stub class.
EVENT_METHODS = {
    "click": stub.Button,
    "change": stub._Component,
    "launch": stub.Blocks,
}


def _gr_attribute_paths():
    """All dotted paths rooted at `gr` used anywhere in ui/app.py,
    e.g. 'Button', 'themes.Soft', 'update', 'render'."""
    tree = ast.parse(APP_PATH.read_text())
    paths = set()

    def root_path(node):
        parts = []
        while isinstance(node, ast.Attribute):
            parts.append(node.attr)
            node = node.value
        if isinstance(node, ast.Name) and node.id == "gr":
            return ".".join(reversed(parts))
        return None

    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute):
            p = root_path(node)
            if p:
                paths.add(p)
    # Keep only the longest paths (drop 'themes' when 'themes.Soft' is used).
    return sorted(p for p in paths
                  if not any(q != p and q.startswith(p + ".") for q in paths))


def test_app_uses_gradio():
    # Sanity: the scan actually sees the UI surface (guards against the
    # test going vacuous if app.py is refactored to alias the import).
    paths = _gr_attribute_paths()
    assert len(paths) >= 10, paths
    assert "Blocks" in paths and "Tab" in paths


@pytest.mark.parametrize("path", _gr_attribute_paths())
def test_stub_declares_every_gradio_symbol(path):
    obj = stub
    for part in path.split("."):
        assert hasattr(obj, part), (
            f"ui/app.py uses gr.{path} but tests/gradio_stub.py does not "
            f"declare it — extend the stub (and verify against the real "
            f"gradio API) before shipping the app change")
        obj = getattr(obj, part)


def test_stub_declares_event_methods():
    tree = ast.parse(APP_PATH.read_text())
    called = {node.func.attr for node in ast.walk(tree)
              if isinstance(node, ast.Call)
              and isinstance(node.func, ast.Attribute)}
    for name, owner in EVENT_METHODS.items():
        if name in called:
            assert callable(getattr(owner, name, None)), (
                f"ui/app.py wires .{name}(...) but the stub class "
                f"{owner.__name__} does not implement it")


def test_no_unpinned_event_wiring():
    """Any unknown `.method(fn, inputs, outputs)`-shaped call on a likely
    gradio object (first positional arg is a function reference and there
    are list-typed wiring args) must be added to EVENT_METHODS."""
    tree = ast.parse(APP_PATH.read_text())
    known = set(EVENT_METHODS) | {"render"}
    suspicious = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)):
            continue
        name = node.func.attr
        if name in known:
            continue
        args = list(node.args) + [k.value for k in node.keywords]
        has_fn = any(isinstance(a, ast.Name) and a.id.startswith("_")
                     for a in args[:1])
        has_wiring = any(isinstance(a, ast.List) for a in args)
        if has_fn and has_wiring:
            suspicious.append((name, node.lineno))
    assert not suspicious, (
        f"event-wiring-shaped calls not pinned by EVENT_METHODS: "
        f"{suspicious} — if these are gradio events, add them to the "
        f"table and implement them in tests/gradio_stub.py")

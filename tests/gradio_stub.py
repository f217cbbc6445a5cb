"""Minimal API-faithful gradio stub for testing ui/app.py's Blocks
assembly without the real dependency (gradio is not installed by design —
CLAUDE.md). Mirrors exactly the symbols app.py uses: containers are
context managers that record structure, Button.click records wiring, and
component `value` defaults are kept so tests can invoke the wired
callbacks with the UI's default arguments."""

from __future__ import annotations

_STACK = []


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        self.value = kwargs.get("value")
        if _STACK:
            _STACK[-1].children.append(self)

    def _record_event(self, kind, fn, inputs, outputs):
        wiring = {"event": kind, "fn": fn, "inputs": inputs or [],
                  "outputs": outputs or []}
        root = _STACK[0] if _STACK else None
        if root is not None:
            root.clicks.append(wiring)
        return self

    def change(self, fn, inputs=None, outputs=None):
        return self._record_event("change", fn, inputs, outputs)


class Markdown(_Component):
    pass


class Textbox(_Component):
    pass


class Slider(_Component):
    pass


class Radio(_Component):
    pass


class Number(_Component):
    pass


class Image(_Component):
    pass


class ImageEditor(_Component):
    """Real gradio's value is a dict {"background", "layers", "composite"};
    the stub keeps whatever `value` was passed (None by default)."""


class Audio(_Component):
    pass


class Dropdown(_Component):
    pass


class State(_Component):
    def __init__(self, value=None, **kwargs):
        super().__init__(value=value, **kwargs)


class File(_Component):
    pass


class Button(_Component):
    def click(self, fn, inputs=None, outputs=None):
        return self._record_event("click", fn, inputs, outputs)


class _Container(_Component):
    def __init__(self, *args, **kwargs):
        self.children = []
        super().__init__(*args, **kwargs)

    def __enter__(self):
        _STACK.append(self)
        return self

    def __exit__(self, *exc):
        _STACK.pop()
        return False


class Row(_Container):
    pass


class Tab(_Container):
    def __init__(self, name, **kwargs):
        self.name = name
        super().__init__(**kwargs)
        root = _STACK[0] if _STACK else None
        if root is not None:
            root.tabs.append(self)


class Blocks(_Container):
    def __init__(self, *args, **kwargs):
        self.tabs = []
        self.clicks = []
        super().__init__(*args, **kwargs)

    def launch(self, *a, **k):
        raise RuntimeError("stub Blocks cannot launch")


class _Themes:
    @staticmethod
    def Soft(*a, **k):
        return "soft-theme"


themes = _Themes()


def update(**kwargs):
    return {"__type__": "update", **kwargs}


def render(inputs=None, triggers=None):
    """Stub of gr.render: run the decorated fn ONCE at build time with the
    input components' default values (real gradio re-runs it whenever an
    input changes). Components/events it creates are recorded normally."""
    inputs = inputs or []

    def deco(fn):
        fn(*[c.value for c in inputs])
        return fn

    return deco

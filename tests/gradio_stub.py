"""A minimal recording stand-in for ``gradio`` so the demo's Blocks graph
can be constructed and its event wiring verified without the real package
(gradio is not installed in this image — VERDICT r3 weak #7).

Implements exactly the API surface ``demo/app.py`` uses: ``Blocks`` (with
``.queue()`` and context-manager layout), the layout containers
``Row``/``Column``/``Tab``/``Accordion``, the components ``Markdown`` /
``Textbox`` / ``Slider`` / ``Dropdown`` / ``Checkbox`` / ``Button`` /
``Gallery`` / ``Image`` / ``ImageMask``, and a callable ``Progress``.
Every component records its kwargs and the tab it was created under;
``Button.click`` records the event (fn, inputs, outputs, tab) on the
owning ``Blocks`` so tests can assert the graph and invoke the handlers.

Install with ``sys.modules["gradio"] = tests.gradio_stub`` (see
``tests/test_demo_app.py``) BEFORE calling ``demo.app.build_demo`` — the
demo imports gradio lazily inside ``build_demo``.
"""

_ACTIVE_BLOCKS = []  # stack: innermost active Blocks


def _blocks():
    return _ACTIVE_BLOCKS[-1] if _ACTIVE_BLOCKS else None


class Component:
    """Base: records construction args and registers with the active Blocks."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        if self.label is None and args and isinstance(args[0], str):
            self.label = args[0]
        b = _blocks()
        self.tab = b._current_tab if b is not None else None
        if b is not None:
            b.components.append(self)

    def __repr__(self):
        return f"<{type(self).__name__} label={self.label!r} tab={self.tab!r}>"


class _Container(Component):
    """Layout containers are components that also act as `with` scopes."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Row(_Container):
    pass


class Column(_Container):
    pass


class Accordion(_Container):
    pass


class Tab(_Container):
    def __enter__(self):
        b = _blocks()
        assert b is not None, "gr.Tab used outside a Blocks context"
        self._prev_tab = b._current_tab
        b._current_tab = self.label
        b.tabs.append(self.label)
        return self

    def __exit__(self, *exc):
        # guard: if the Blocks stack was unwound by an exception during graph
        # construction, don't mask the original error with an AttributeError
        b = _blocks()
        if b is not None:
            b._current_tab = self._prev_tab
        return False


class Markdown(Component):
    pass


class Textbox(Component):
    pass


class Slider(Component):
    pass


class Dropdown(Component):
    pass


class Checkbox(Component):
    pass


class Gallery(Component):
    pass


class Image(Component):
    pass


class ImageMask(Component):
    pass


class Button(Component):
    def click(self, fn=None, inputs=None, outputs=None, **kwargs):
        b = _blocks()
        assert b is not None, "Button.click outside a Blocks context"
        b.events.append(
            {
                "trigger": "click",
                "button": self,
                "fn": fn,
                "inputs": list(inputs or []),
                "outputs": list(outputs or []),
                "tab": self.tab,
            }
        )
        return self


class Progress:
    """Callable like gradio's live progress: ``progress(frac, desc=...)``."""

    def __init__(self, *args, **kwargs):
        self.calls = []

    def __call__(self, fraction, desc=None, **kwargs):
        self.calls.append((float(fraction), desc))
        return self


class Blocks:
    def __init__(self, *args, **kwargs):
        self.kwargs = kwargs
        self.components = []
        self.events = []
        self.tabs = []
        self._current_tab = None
        self.queued = False
        self.launched = False

    def queue(self, **kwargs):
        self.queued = True
        return self

    def launch(self, **kwargs):
        self.launched = True
        return self

    def __enter__(self):
        _ACTIVE_BLOCKS.append(self)
        return self

    def __exit__(self, *exc):
        _ACTIVE_BLOCKS.pop()
        return False

"""Web UI: gradio app with the reference's four task tabs, plus synthesized
presets. gradio is an optional dependency - the app module degrades to a CLI
demo when it is absent."""

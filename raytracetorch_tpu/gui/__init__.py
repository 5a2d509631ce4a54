"""Browser workbench (the reference's gui/ layer, re-hosted as a headless
HTTP server + single-page app — see server.py)."""

from .server import Workbench, make_handler, run, serve  # noqa: F401

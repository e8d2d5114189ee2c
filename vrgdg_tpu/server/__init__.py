"""HTTP API server (L4): the /vrgdg/... route surface, standalone."""

from .routes import create_app, main

__all__ = ["create_app", "main"]

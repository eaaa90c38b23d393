from .service import RecommenderService
from .server import make_server, serve_forever

__all__ = ["RecommenderService", "make_server", "serve_forever"]

from .batching import BatchingRecommender
from .service import RecommenderService
from .server import make_server, serve_forever

__all__ = [
    "BatchingRecommender",
    "RecommenderService",
    "make_server",
    "serve_forever",
]

from .analysis import (
    doc_fingerprint,
    language_id,
    quality_features,
    token_count,
    tokens,
)

__all__ = ["doc_fingerprint", "language_id", "quality_features", "token_count", "tokens"]

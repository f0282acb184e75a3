from .matcher import KawaMatcher, DEFAULT_STRIP_CHARS, TRANNUM  # noqa: F401

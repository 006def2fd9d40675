from .basic import BasicTextNormalizer  # noqa: F401

try:  # english normalizer needs no extra deps but keep import robust
    from .english import EnglishTextNormalizer  # noqa: F401
except ImportError:  # pragma: no cover
    EnglishTextNormalizer = None

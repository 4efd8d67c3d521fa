from . import play_parser, text, vectors  # noqa: F401

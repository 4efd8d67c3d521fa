from . import shot_synth  # noqa: F401

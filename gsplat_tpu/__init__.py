"""Short import alias for openglgaussiansplattingrenderer_tpu."""

from openglgaussiansplattingrenderer_tpu import *  # noqa: F401,F403
from openglgaussiansplattingrenderer_tpu import (  # noqa: F401
    camera, config, golden, render, splats,
)
from openglgaussiansplattingrenderer_tpu import io, ops  # noqa: F401

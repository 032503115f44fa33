from openglgaussiansplattingrenderer_tpu.utils.timing import (  # noqa: F401
    FrameTimer,
    fence,
    time_stages,
)

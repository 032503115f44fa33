from openglgaussiansplattingrenderer_tpu.viewer.offline import (  # noqa: F401
    orbit_cameras,
    render_orbit,
    render_frame,
)
from openglgaussiansplattingrenderer_tpu.viewer import interactive  # noqa: F401

from .viewer import ViewerBase
from .viewer_file import ViewerFile
from .viewer_null import ViewerNull

__all__ = ["ViewerBase", "ViewerFile", "ViewerGL", "ViewerNull",
           "ViewerPlot", "ViewerRerun", "ViewerRTX", "ViewerUSD",
           "ViewerViser"]


def __getattr__(name):
    # optional-dependency backends load lazily (reference gates GL/rerun/
    # viser backends on their imports the same way)
    if name == "ViewerGL":
        from .viewer_gl import ViewerGL
        return ViewerGL
    if name == "ViewerRTX":
        from .viewer_rtx import ViewerRTX
        return ViewerRTX
    if name == "ViewerRerun":
        from .viewer_rerun import ViewerRerun
        return ViewerRerun
    if name == "ViewerPlot":
        from .viewer_plot import ViewerPlot
        return ViewerPlot
    if name == "ViewerUSD":
        from .viewer_usd import ViewerUSD
        return ViewerUSD
    if name == "ViewerViser":
        from .viewer_viser import ViewerViser
        return ViewerViser
    raise AttributeError(name)

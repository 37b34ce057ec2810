from .viewer import ViewerBase
from .viewer_file import ViewerFile
from .viewer_null import ViewerNull

__all__ = ["ViewerBase", "ViewerFile", "ViewerNull"]

from . import (multiprompt, multiview_multiprompt, uncond,  # noqa: F401
               uncond_multiview)

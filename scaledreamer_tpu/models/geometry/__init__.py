from . import (base, conv3d_modules, hyper_ingp, implicit_sdf,  # noqa: F401
               implicit_volume, stylegan_3dconv_net, triplane_transformer)

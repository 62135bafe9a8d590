from .sdf import SDFNet, init_sdf_params, sdf_apply, sdf_value_and_grad  # noqa: F401
from .translator import TranslatorNet, init_translator_params, translator_apply  # noqa: F401
from .render import RenderNet, init_render_params, render_apply  # noqa: F401

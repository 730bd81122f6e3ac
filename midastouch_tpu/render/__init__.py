from midastouch_tpu.render.digit import DigitRenderer, RenderConfig  # noqa: F401

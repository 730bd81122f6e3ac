from midastouch_tpu.codebook.codebook import Codebook  # noqa: F401

from midastouch_tpu.models.fcrn import FCRN  # noqa: F401
from midastouch_tpu.models.voxfpn import VoxelFPN  # noqa: F401
from midastouch_tpu.models.tdn import TDN  # noqa: F401
from midastouch_tpu.models.tcn import TCN  # noqa: F401

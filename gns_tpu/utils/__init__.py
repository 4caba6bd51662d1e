from gns_tpu.utils.schema import BUS, GEN, LINE, get_BLG  # noqa: F401
from gns_tpu.utils.config import GNSConfig, preset  # noqa: F401

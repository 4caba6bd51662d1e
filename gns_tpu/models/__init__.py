from gns_tpu.models.blocks import init_learning_block, learning_block_apply  # noqa: F401
from gns_tpu.models.gns import GNSOutput, gns_forward, init_gns_params  # noqa: F401

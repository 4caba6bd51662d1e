from gns_tpu.physics.compensation import global_active_compensation  # noqa: F401
from gns_tpu.physics.imbalance import local_power_imbalance  # noqa: F401
from gns_tpu.physics.lineflow import active_line_flow  # noqa: F401

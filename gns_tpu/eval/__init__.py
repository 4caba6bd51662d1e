from gns_tpu.eval.newton_raphson import NRResult, newton_raphson_pf  # noqa: F401

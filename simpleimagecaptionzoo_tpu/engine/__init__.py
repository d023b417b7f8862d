from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform  # noqa: F401
from simpleimagecaptionzoo_tpu.engine.state import TrainState  # noqa: F401

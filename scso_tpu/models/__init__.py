"""Model/loss library and synthetic data generators."""
from scso_tpu.models import losses, synthetic

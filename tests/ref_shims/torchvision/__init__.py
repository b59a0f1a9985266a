"""Test-only torchvision stub: provides the class names the reference touches in
isinstance checks. Real torchvision is not installed in this environment."""
from . import models  # noqa
from . import transforms  # noqa

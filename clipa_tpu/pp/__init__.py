"""Host-side preprocessing: tokenizers and image/text/general pp ops.

Importing this package registers all pp ops with the global Registry.
"""

from clipa_tpu.pp import augment  # noqa: F401
from clipa_tpu.pp import autoaugment  # noqa: F401
from clipa_tpu.pp import ops_general  # noqa: F401
from clipa_tpu.pp import ops_image  # noqa: F401
from clipa_tpu.pp import ops_text  # noqa: F401
from clipa_tpu.pp import randaugment  # noqa: F401

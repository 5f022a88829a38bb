from mimo_tpu.utils import linalg
from mimo_tpu.utils import stats
from mimo_tpu.utils import data

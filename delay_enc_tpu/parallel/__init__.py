from .mesh import make_mesh
from .msm import sharded_msm
from .ntt import sharded_ntt, ShardedNTTPlan
from .batch import batch_commit

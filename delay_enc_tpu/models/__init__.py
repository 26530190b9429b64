from .pose_enc import PoseidonEncCircuit

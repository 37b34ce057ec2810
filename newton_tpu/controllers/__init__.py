from .controller_neural import ControllerNeuralLSTM, ControllerNeuralMLP
from .controller_pd import ControllerPD
from .controller_pid import ControllerPID
from .joint_impedance import JointImpedanceModelBased, JointImpedanceModelFree

__all__ = ["ControllerNeuralLSTM", "ControllerNeuralMLP", "ControllerPD",
           "ControllerPID", "JointImpedanceModelBased",
           "JointImpedanceModelFree"]

"""GLM/GLMM layer — logistic regression and the logistic mixed model."""

from dissect_tpu.glm.logistic import LogisticGLM, fit_logistic
from dissect_tpu.glm.glmm import GLMM

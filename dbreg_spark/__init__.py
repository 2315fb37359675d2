"""dbreg_spark — a PySpark-native regression & analytics engine.

Brand-new implementation of the capabilities of grantmcdermott/dbreg
(OLS/fixed-effects regression pushed into the engine via four acceleration
strategies, robust/clustered SEs, binscatter) re-expressed as idiomatic
Spark DataFrame plans, plus large-scale data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).
"""

from .api import dbreg, sql_model_matrix
from .binsreg import BinsregResult, dbbinsglm, dbbinsreg
from .boot import (
    load_bootstrap,
    save_bootstrap,
    wild_cluster_bootstrap,
    wild_score_bootstrap,
)
from .design import standardize_coef_names
from .formula import parse_formula, parse_vcov
from .glm import GlmModel, dbglm
from .iv import IvModel, dbiv
from .model import DbregModel
from .eventstudy import EventStudyResult, event_study, sun_abraham
from .diagnostics import mundlak_hausman, wooldridge_fd_test
from .etable import etable
from .multi import DbregMulti, dbreg_multi
from .multi_glm import GlmMulti, dbglm_multi
from .split import DbregSplit, dbreg_split
from .split_glm import GlmSplit, dbglm_split
from .pipeline import corpus_pipeline

__all__ = [
    "dbreg",
    "sql_model_matrix",
    "dbbinsglm",
    "dbbinsreg",
    "wild_cluster_bootstrap",
    "wild_score_bootstrap",
    "save_bootstrap",
    "load_bootstrap",
    "corpus_pipeline",
    "BinsregResult",
    "DbregModel",
    "dbglm",
    "GlmModel",
    "dbiv",
    "dbreg_multi",
    "etable",
    "mundlak_hausman",
    "wooldridge_fd_test",
    "dbglm_multi",
    "GlmMulti",
    "DbregMulti",
    "dbreg_split",
    "dbglm_split",
    "GlmSplit",
    "event_study",
    "sun_abraham",
    "EventStudyResult",
    "DbregSplit",
    "IvModel",
    "parse_formula",
    "parse_vcov",
    "standardize_coef_names",
]

__version__ = "0.1.0"

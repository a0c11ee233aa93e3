from .config import Config, config_override, get_config, print_config, reset_config, set_config
from .errors import DbcsrError, dbcsr_abort, dbcsr_assert, dbcsr_warn
from .lib import finalize_lib, init_lib, is_initialized
from .logging import Logger, get_logger, log, pop_logger, push_logger
from .machine import (
    device_memory_stats,
    m_energy,
    m_flush,
    m_memory,
    m_peak_memory,
    m_walltime,
)
from .stats import get_stats, print_statistics, reset_stats
from .timing import (timed, timer_report, timeset, timestop, reset_timers,
                     timings_report_callgraph, set_tracing)

__all__ = [
    "Config", "config_override", "get_config", "print_config", "reset_config", "set_config",
    "DbcsrError", "dbcsr_abort", "dbcsr_assert", "dbcsr_warn",
    "finalize_lib", "init_lib", "is_initialized",
    "Logger", "get_logger", "log", "push_logger", "pop_logger",
    "m_walltime", "m_memory", "m_peak_memory", "m_flush", "m_energy", "device_memory_stats",
    "get_stats", "print_statistics", "reset_stats",
    "timed", "timer_report", "timeset", "timestop", "reset_timers",
    "timings_report_callgraph", "set_tracing",
]

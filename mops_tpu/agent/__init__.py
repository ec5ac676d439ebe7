from .agent import RouteResult, route_request, generate_job, run_agent
from .llm_client import chat_completion, make_llm, resolve_provider
from .task_templates import (DEFAULT_PATHLINE_CONFIG, DEFAULT_REMAPPING_CONFIG,
                             DEFAULT_STREAMLINE_CONFIG, extract_config,
                             generate_stream_yaml, render_job)

__all__ = ["RouteResult", "route_request", "generate_job", "run_agent",
           "DEFAULT_REMAPPING_CONFIG", "DEFAULT_STREAMLINE_CONFIG",
           "DEFAULT_PATHLINE_CONFIG", "extract_config", "render_job",
           "generate_stream_yaml", "chat_completion", "make_llm",
           "resolve_provider"]

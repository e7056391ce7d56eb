from .model_server import ModelServer, start_model_server

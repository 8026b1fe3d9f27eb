from .loader import DataLoader, Compose

"""Streaming callbacks for incremental decode output.

``ConsoleStreamer`` mirrors the reference's ConsoleSteamer
(examples/bloom_interactive.py:17-48): called with the (bsz, beams, len)
token array after every decoded token, prints the newly decoded text suffix,
and returns True to stop generation when a stop-string appears.

The original class name ("Steamer") is kept as an alias for API parity.
"""

import sys

import numpy as np


class ConsoleStreamer:
    def __init__(self, tokenizer, input_text_len, stops=None, out=None):
        self.tokenizer = tokenizer
        self.origin_text_len = input_text_len
        self.printed_text_len = input_text_len
        self.stops = stops
        self.final_generation = ""
        self.out = out or sys.stdout

    def __call__(self, token_ids):
        token_ids = np.asarray(token_ids)
        sequence = token_ids[0][0].tolist()
        text = self.tokenizer.decode(sequence, skip_special_tokens=True,
                                     clean_up_tokenization_spaces=True)
        if len(text) > self.printed_text_len:
            self.out.write(text[self.printed_text_len:])
            self.out.flush()
            self.final_generation = text
            if self.stops is not None:
                for stop in self.stops:
                    if text[self.origin_text_len:].find(stop) > -1:
                        self.out.write("<|endoftext|>\n")
                        self.out.flush()
                        return True
            self.printed_text_len = len(text)
        return False


ConsoleSteamer = ConsoleStreamer  # reference spelling (bloom_interactive.py:17)

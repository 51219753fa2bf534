"""Belle multi-turn preprocessing (reference: datasets/belle/data_preprocess.py):
{"conversations": [{"from": "human", "value": ...}, {"from": "assistant", ...}]}
-> one {"instruction", "output"} jsonl line per assistant turn, with the full
preceding dialogue folded into the instruction and role alternation asserted.

  python datasets/belle/data_preprocess.py in.jsonl out.jsonl
"""

import json
import sys


def process_file(in_fn, out_fn):
    n_in = n_out = 0
    with open(in_fn) as fin, open(out_fn, "w") as fout:
        for line in fin:
            if not line.strip():
                continue
            n_in += 1
            convs = json.loads(line)["conversations"]
            context = ""
            for i, turn in enumerate(convs):
                role = turn["from"].lower()
                expected = "human" if i % 2 == 0 else "assistant"
                assert role == expected, f"role alternation broken at turn {i}"
                if role == "human":
                    context += f"\n\nHuman: {turn['value']}"
                else:
                    fout.write(json.dumps(
                        {"instruction": context + "\n\nAssistant: ",
                         "output": turn["value"]}, ensure_ascii=False) + "\n")
                    context += f"\n\nAssistant: {turn['value']}"
                    n_out += 1
    print(f"{n_in} conversations -> {n_out} samples")


if __name__ == "__main__":
    process_file(sys.argv[1], sys.argv[2])

package graft.bindings.fake;

/**
 * Mirrors kafka-clients' AlterConfigOp shape (an entry + an OpType enum
 * constant) for the 4.x-classpath parity tests: Admin.alterConfigs was
 * removed in kafka-clients 4.0, so the binding falls back to
 * incrementalAlterConfigs with SET ops — this double lets the spec drive
 * that path without the kafka jar. Java so the nested OpType is a real
 * enum, resolvable as {@code <class>$OpType} with enum constants, exactly
 * like the real client's.
 */
public final class FakeAlterConfigOp {
  public enum OpType { SET, DELETE, APPEND, SUBTRACT }

  private final Object entry;
  private final OpType op;

  public FakeAlterConfigOp(Object entry, OpType op) {
    this.entry = entry;
    this.op = op;
  }

  public Object configEntry() { return entry; }
  public OpType opType() { return op; }
}

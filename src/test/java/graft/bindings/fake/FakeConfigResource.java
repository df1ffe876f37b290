package graft.bindings.fake;

import java.util.Objects;

/**
 * Test double mirroring org.apache.kafka.common.config.ConfigResource's
 * reflective surface: a nested {@code Type} enum resolved by
 * {@code Class.forName(ns.configResource + "$Type")} plus a
 * {@code (Type, String)} constructor and {@code name()} — which is why
 * this one double is Java (a Scala object named {@code Type} compiles to
 * {@code Type$} and would not resolve).
 */
public final class FakeConfigResource {
  public enum Type { TOPIC, BROKER }

  private final Type type;
  private final String name;

  public FakeConfigResource(Type type, String name) {
    this.type = type;
    this.name = name;
  }

  public Type type() { return type; }
  public String name() { return name; }

  @Override public boolean equals(Object o) {
    if (!(o instanceof FakeConfigResource)) return false;
    FakeConfigResource r = (FakeConfigResource) o;
    return type == r.type && name.equals(r.name);
  }

  @Override public int hashCode() { return Objects.hash(type, name); }

  @Override public String toString() { return type + ":" + name; }
}
